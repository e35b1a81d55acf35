from .params import (  # noqa: F401
    NetKernelParams,
    ParamsBase,
    CTCParams,
    CTCInferenceParams,
    default_net_kernel_params,
    load_recipe,
    tiny_net_kernel_params,
)
