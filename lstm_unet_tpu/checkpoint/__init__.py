from .ckpt import (CheckpointManager, average_checkpoints,  # noqa: F401
                   save_model_params, load_model_params, resolve_model_dir)
