from .ulstm_unet import ModelConfig, ULSTMnet2D  # noqa: F401
