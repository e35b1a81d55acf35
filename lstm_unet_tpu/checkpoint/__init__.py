from .ckpt import CheckpointManager, save_model_params, load_model_params  # noqa: F401
