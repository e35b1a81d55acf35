from .det import det_counts, det_measure_sequence  # noqa: F401
from .seg import seg_measure, seg_measure_sequence  # noqa: F401
