from .loss import weighted_ce_loss  # noqa: F401
from .train import Trainer, make_train_step  # noqa: F401
from .infer import (  # noqa: F401
    StreamingInferenceEngine,
    run_inference,
    run_inference_batched,
)
