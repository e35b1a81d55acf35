from .conv import conv2d, max_pool_2x2, upsample_2x, init_conv  # noqa: F401
from .convlstm import ConvLSTMCell  # noqa: F401
from .ccl import connected_components, relabel_compact  # noqa: F401
from .postprocess import postprocess_frame  # noqa: F401
from .quant import conv2d_q, quantize_params_int8, quantize_weight  # noqa: F401
