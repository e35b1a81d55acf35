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


def resolve_model_dir(directory: str) -> str:
    """Accept a model dir OR the training RUN dir that nests it.

    The Trainer writes ``<run>/ckpt/{model_params.json, <step>/...}``; CLI
    users (and the chip pipeline) naturally pass the run dir itself. When
    ``model_params.json`` is absent at ``directory`` but present under its
    ``ckpt/`` subdir, resolve to that subdir; otherwise return the input
    unchanged (so error messages still point at what the user typed).
    """
    if not os.path.exists(os.path.join(directory, MODEL_PARAMS_FILE)):
        sub = os.path.join(directory, "ckpt")
        if os.path.exists(os.path.join(sub, MODEL_PARAMS_FILE)):
            return sub
    return directory


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


def average_checkpoints(src_dir: str, out_dir: str,
                        steps=None, out_step: Optional[int] = None) -> int:
    """Checkpoint averaging ("model soup") into a fresh inference model dir.

    Uniform parameter-space average over ``steps`` (default: every step saved
    under ``src_dir``), accumulated in float32 and cast back to each leaf's
    original dtype. The result is written to ``out_dir`` as a *params-only*
    checkpoint at ``out_step`` (default: max of the averaged steps) with
    ``model_params.json`` copied alongside, so the standard
    ``engine.infer.load_model`` path loads it unchanged. The training dir is
    never touched (a soup step saved in-place would evict real checkpoints
    via max_to_keep), and optimizer state is deliberately not averaged —
    soups are an inference-time artifact. ``act_scales.json`` is NOT copied:
    averaged weights shift activation ranges, so the int8 path must be
    recalibrated (the step-stamped provenance guard would reject stale
    scales anyway).

    Beyond-reference capability: the reference keeps max_to_keep TF
    checkpoints (SURVEY.md §5) but has no averaging; standard practice in
    production serving stacks since late-epoch SGD iterates are cheap
    variance reduction.
    """
    import numpy as np

    src_dir = resolve_model_dir(src_dir)
    src = CheckpointManager(src_dir)
    try:
        steps = sorted(int(s) for s in (steps or src.all_steps()))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {src_dir}")
        acc = None
        treedef = None
        dtypes = None
        for s in steps:
            out = src._mgr.restore(
                s, args=ocp.args.Composite(params=ocp.args.StandardRestore()))
            import jax
            leaves, td = jax.tree_util.tree_flatten(out["params"])
            if acc is None:
                treedef = td
                dtypes = [np.asarray(l).dtype for l in leaves]
                # np.asarray can alias a read-only buffer when the dtype
                # already matches — the accumulator must own its memory
                acc = [np.array(l, dtype=np.float32, copy=True)
                       for l in leaves]
            else:
                if td != treedef:
                    raise ValueError(
                        f"step {s} param tree differs from step {steps[0]}")
                for a, l in zip(acc, leaves):
                    a += np.asarray(l, dtype=np.float32)
        inv = 1.0 / float(len(steps))
        import jax
        avg = [np.asarray(a * inv, dtype=dt) for a, dt in zip(acc, dtypes)]
        params = jax.tree_util.tree_unflatten(treedef, avg)
    finally:
        src.close()

    os.makedirs(out_dir, exist_ok=True)
    arch_src = os.path.join(src_dir, MODEL_PARAMS_FILE)
    if os.path.exists(arch_src):
        with open(arch_src) as f:
            save_model_params(out_dir, json.load(f))
    out_step = out_step if out_step is not None else max(steps)
    dst = CheckpointManager(out_dir, max_to_keep=1)
    try:
        dst._mgr.save(out_step,
                      args=ocp.args.Composite(params=ocp.args.StandardSave(params)))
        dst.wait()
    finally:
        dst.close()
    return out_step
