from .seg import seg_measure, seg_measure_sequence  # noqa: F401
