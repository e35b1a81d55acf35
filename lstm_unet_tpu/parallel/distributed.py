"""Multi-host initialization.

No reference analog (single process, single GPU — SURVEY.md §2 comm row).
This wraps ``jax.distributed.initialize`` for multi-host TPU pods/slices:
on TPU pods JAX auto-detects coordinator/process ids from the environment;
explicit args cover DCN multi-slice and CPU/GPU clusters.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..utils import log_print

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed.initialize; no-op for single-process runs.

    Call before any jax device use when running multi-host. Single-host
    (the common case, and all this repo's CI) skips cleanly.
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    on_pod = any(k in os.environ for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not on_pod:
        log_print("distributed.initialize: single process, skipping")
        return
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    log_print(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices")
