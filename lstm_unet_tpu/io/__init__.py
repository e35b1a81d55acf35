from .tiff import read_tiff, write_tiff  # noqa: F401
from .preprocess import (  # noqa: F401
    percentile_normalize,
    percentile_normalize_np,
    instance_to_three_class,
    pad_to_multiple,
)
from .dataset import CTCRAMReaderSequence2D, CTCInferenceReader  # noqa: F401
