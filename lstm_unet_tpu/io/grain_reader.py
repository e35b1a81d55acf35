"""Deterministic grain-based training input pipeline.

Alternative ``data_provider_class`` (SURVEY.md §2 "Training reader" —
TPU-native equivalent column names a grain/numpy host pipeline; reference:
``DataHandeling.py`` threaded queues). Same batch contract as
``CTCRAMReaderSequence2D`` (img/seg/valid/full_seg/is_last [+inst], per-lane
traversals, BPTT lane continuity), with one structural upgrade:

**batch(step) is a pure function of (seed, step).** Each lane's walk through
(sequence, augmentation, window) triples is derived from a counter-based RNG
seeded by (seed, lane, traversal_index), so the whole input stream is
deterministic, order-stable, and resumable from ANY step without replaying
the prefix — the trainer passes ``set_start_step(global_step)`` on
continue_run and the stream picks up exactly where the checkpoint left off
(the threaded reader restarts from fresh traversals instead).

grain supplies the prefetch machinery (`MapDataset.to_iter_dataset` with a
read-ahead buffer). Output order is the single consumer-facing stream the
BPTT state-carry contract requires — prefetch parallelism never reorders
batches (see CTCRAMReaderSequence2D's threading note).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..config import CTCParams
from ..utils import log_print
from .dataset import CTCRAMReaderSequence2D


class GrainCTCReaderSequence2D(CTCRAMReaderSequence2D):
    """Deterministic/resumable provider; drop-in for the threaded reader."""

    def __init__(self, params: CTCParams, sequence_list: Optional[Sequence] = None,
                 num_threads: Optional[int] = None, queue_capacity: int = 16,
                 seed: int = 0, return_instances: bool = False):
        super().__init__(params, sequence_list, num_threads=1,
                         queue_capacity=queue_capacity, seed=seed,
                         return_instances=return_instances)
        self._start_step = 0
        self._iter = None
        self._prefetch = max(2, min(queue_capacity, 16))
        # per-lane caches: traversals [(seq, aug)] and cumulative window counts
        self._trav: List[list] = [[] for _ in range(self.batch)]
        self._cum: List[list] = [[] for _ in range(self.batch)]

    # -- deterministic schedule ---------------------------------------------

    def _traversal_at(self, lane: int, t_idx: int):
        cache = self._trav[lane]
        while len(cache) <= t_idx:
            rng = np.random.default_rng(
                np.random.SeedSequence([self._seed, lane, len(cache)]))
            s, aug = self._new_traversal(rng)
            cache.append((s, aug))
            n_windows = max(1, -(-len(s) // self.unroll))  # ceil
            cum = self._cum[lane]
            cum.append((cum[-1] if cum else 0) + n_windows)
        return cache[t_idx]

    def _lane_window(self, lane: int, step: int):
        """Map a global step to this lane's (sequence, aug, window_start)."""
        cum = self._cum[lane]
        t_idx = 0
        while True:
            if t_idx >= len(cum):
                self._traversal_at(lane, t_idx)
            if step < cum[t_idx]:
                break
            t_idx += 1
        prev = cum[t_idx - 1] if t_idx else 0
        s, aug = self._trav[lane][t_idx]
        return s, aug, (step - prev) * self.unroll

    def make_batch(self, step: int):
        """Pure-function batch for global step ``step`` (same tuple contract
        as the threaded reader's get_batch)."""
        imgs, segs, insts, valids, fulls, lasts = [], [], [], [], [], []
        for lane in range(self.batch):
            s, aug, start = self._lane_window(lane, step)
            img, seg, inst, valid, full_seg, is_last = self._window(s, aug, start)
            imgs.append(img); segs.append(seg); insts.append(inst)
            valids.append(valid); fulls.append(full_seg); lasts.append(is_last)
        batch = (
            np.stack(imgs)[..., None],
            np.stack(segs),
            np.stack(valids),
            np.stack(fulls),
            np.asarray(lasts, np.float32),
        )
        if self.return_instances:
            batch = batch + (np.stack(insts),)
        return batch

    # -- provider API (same surface as the threaded reader) ------------------

    def set_start_step(self, step: int) -> None:
        """Resume the input stream at a global step (continue_run)."""
        self._start_step = int(step)

    def start_queues(self) -> None:
        if self._iter is not None:
            return
        import grain.python as gp

        ds = gp.MapDataset.source(_Steps()).map(self.make_batch)
        it_ds = ds[self._start_step:].to_iter_dataset(
            gp.ReadOptions(num_threads=1,
                           prefetch_buffer_size=self._prefetch))
        self._iter = iter(it_ds)
        log_print(f"GrainCTCReaderSequence2D: deterministic stream from "
                  f"step {self._start_step} (prefetch {self._prefetch})")

    def get_batch(self):
        return next(self._iter)

    def stop(self) -> None:
        self._iter = None


class _Steps:
    """Unbounded-ish step index source (grain needs a finite len)."""

    _N = 2 ** 31 - 1

    def __len__(self):
        return self._N

    def __getitem__(self, i):
        return i
