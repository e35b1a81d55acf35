"""Checkpointing via orbax.

Reference parity (SURVEY.md §5 "Checkpoint / resume"): the reference uses
``tf.train.Checkpoint`` (net + optimizer + step) with a ``CheckpointManager``
(max_to_keep) and pickles the architecture params next to the weights so
``Inference2D.py`` can rebuild the model without the training code.

Here: orbax checkpoints (params + opt_state + step) and a JSON architecture
file (``model_params.json``) instead of pickle — same capability, no
arbitrary-code deserialization. Async checkpointing exceeds the reference's
synchronous saves (SURVEY.md §5 failure-recovery row).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

MODEL_PARAMS_FILE = "model_params.json"


def save_model_params(directory: str, arch: Dict[str, Any]) -> None:
    """Save the architecture/config description (reference: pickled params [M])."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, MODEL_PARAMS_FILE), "w") as f:
        json.dump(arch, f, indent=2)


def load_model_params(directory: str) -> Dict[str, Any]:
    with open(os.path.join(directory, MODEL_PARAMS_FILE)) as f:
        return json.load(f)


class CheckpointManager:
    """Thin orbax wrapper: save/restore {params, opt_state, step}."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True),
        )

    def save(self, step: int, params, opt_state) -> None:
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def restore(self, abstract_params, abstract_opt_state,
                step: Optional[int] = None) -> Tuple[Any, Any, int]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(abstract_params),
                opt_state=ocp.args.StandardRestore(abstract_opt_state),
            ),
        )
        return out["params"], out["opt_state"], step

    def restore_params_only(self, abstract_params, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        out = self._mgr.restore(
            step, args=ocp.args.Composite(params=ocp.args.StandardRestore(abstract_params)))
        return out["params"]

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
