from .loss import weighted_ce_loss  # noqa: F401
from .train import Trainer, make_train_step  # noqa: F401
from .infer import StreamingInferenceEngine, run_inference  # noqa: F401
