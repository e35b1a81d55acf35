"""bench.py emission contract: the driver parses ONE JSON line per run.

Covers the round-4 additions: --mfu (HLO flops/step + MFU vs v5e peak) and
the dual train denominators (train_value @ throughput batch,
train_parity_value @ B5 reference parity) — see ADVICE r3 low #5.
"""

import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _capture_stdout(fn):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        fn()
    finally:
        sys.stdout = old
    return buf.getvalue()


def test_bench_train_mfu_emits_flops_and_mfu():
    import bench

    out = _capture_stdout(lambda: bench.bench_train(
        32, "float32", tiny=True, steps=1, emit=True, remat="none",
        B=1, T=1, mfu=True))
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["unit"] == "frames/sec/chip"
    assert d["value"] > 0
    # cost_analysis must have produced a positive flop count on CPU; the
    # mfu key rides with it (rounds to ~0 on CPU — only the chip number
    # is meaningful, but the plumbing is backend-independent)
    assert d.get("train_flops_per_step", 0) > 0, d
    assert "train_mfu" in d, d


def test_bench_train_no_mfu_keys_by_default():
    import bench

    out = _capture_stdout(lambda: bench.bench_train(
        32, "float32", tiny=True, steps=1, emit=True, remat="none",
        B=1, T=1))
    d = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert "train_flops_per_step" not in d
    assert "train_mfu" not in d
