"""Chip-lease preemption protocol (bench.py <-> scripts/chip_pipeline.sh).

One process may use the tunneled TPU at a time; long workloads write their
process-group id to runs/chip.lease and bench.py evicts the group before
benching so the round driver's unconditional `python bench.py` never
collides with a multi-hour training/eval queue.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import preempt_chip_lease  # noqa: E402


def _spawn_group():
    """A throwaway process in its own process group (stand-in workload)."""
    return subprocess.Popen([sys.executable, "-c", "import time; time.sleep(600)"],
                            start_new_session=True)


def test_preempts_live_lease_holder(tmp_path, monkeypatch):
    proc = _spawn_group()
    lease = tmp_path / "chip.lease"
    lease.write_text(str(os.getpgid(proc.pid)))
    monkeypatch.setenv("LSTM_UNET_CHIP_LEASE", str(lease))
    monkeypatch.delenv("LSTM_UNET_NO_PREEMPT", raising=False)

    t0 = time.time()
    # timeout_s bounds the TERM->KILL escalation wait; sleep exits on TERM
    # immediately, so this returns fast (plus the fixed 30 s tunnel-release
    # pause, patched out here to keep the suite quick)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    preempt_chip_lease(timeout_s=20)
    assert proc.wait(timeout=10) != 0  # died by signal, not naturally
    assert not lease.exists()
    assert time.time() - t0 < 30


def test_stale_lease_is_cleared_without_killing(tmp_path, monkeypatch):
    proc = _spawn_group()
    pgid = os.getpgid(proc.pid)
    os.killpg(pgid, signal.SIGKILL)
    proc.wait()
    lease = tmp_path / "chip.lease"
    lease.write_text(str(pgid))
    monkeypatch.setenv("LSTM_UNET_CHIP_LEASE", str(lease))
    monkeypatch.setattr(time, "sleep", lambda s: None)
    preempt_chip_lease(timeout_s=5)
    assert not lease.exists()


def test_no_preempt_env_disables(tmp_path, monkeypatch):
    proc = _spawn_group()
    try:
        lease = tmp_path / "chip.lease"
        lease.write_text(str(os.getpgid(proc.pid)))
        monkeypatch.setenv("LSTM_UNET_CHIP_LEASE", str(lease))
        monkeypatch.setenv("LSTM_UNET_NO_PREEMPT", "1")
        preempt_chip_lease(timeout_s=5)
        assert proc.poll() is None  # untouched
        assert lease.exists()
    finally:
        proc.kill()
        proc.wait()


def test_own_group_never_preempted(tmp_path, monkeypatch):
    lease = tmp_path / "chip.lease"
    lease.write_text(str(os.getpgid(0)))
    monkeypatch.setenv("LSTM_UNET_CHIP_LEASE", str(lease))
    preempt_chip_lease(timeout_s=5)
    assert lease.exists()  # guard: a pipeline-internal bench keeps its lease


def test_garbage_lease_ignored(tmp_path, monkeypatch):
    lease = tmp_path / "chip.lease"
    lease.write_text("not-a-pid")
    monkeypatch.setenv("LSTM_UNET_CHIP_LEASE", str(lease))
    preempt_chip_lease(timeout_s=5)  # must not raise


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_same_session_lease_holder_never_preempted(tmp_path, monkeypatch):
    # GNU timeout setpgid()s its child into a NEW process group, so a bench
    # launched from inside the pipeline has a different pgid than the lease —
    # but the SAME session. The sid guard must refuse to preempt (ADVICE r3
    # high: the pipeline SIGTERMed itself at its first internal bench stage).
    proc = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(600)"],
        preexec_fn=os.setpgrp)  # new group, same session
    try:
        pgid = os.getpgid(proc.pid)
        assert pgid != os.getpgid(0) and os.getsid(proc.pid) == os.getsid(0)
        lease = tmp_path / "chip.lease"
        lease.write_text(str(pgid))
        monkeypatch.setenv("LSTM_UNET_CHIP_LEASE", str(lease))
        monkeypatch.delenv("LSTM_UNET_NO_PREEMPT", raising=False)
        preempt_chip_lease(timeout_s=5)
        assert proc.poll() is None  # untouched
        assert lease.exists()
    finally:
        proc.kill()
        proc.wait()


def test_zombie_group_detected_dead_quickly(tmp_path, monkeypatch):
    # After SIGTERM the child dies but stays a ZOMBIE until reaped;
    # os.killpg(pgid, 0) still succeeds on zombies, which used to spin the
    # whole TERM->KILL deadline (ADVICE r3 low). _group_alive reads /proc
    # states instead.
    from bench import _group_alive

    proc = _spawn_group()
    pgid = os.getpgid(proc.pid)
    assert _group_alive(pgid)
    os.killpg(pgid, signal.SIGKILL)
    deadline = time.time() + 10
    while _group_alive(pgid) and time.time() < deadline:
        time.sleep(0.05)
    assert not _group_alive(pgid)  # zombie counts as dead
    os.killpg(pgid, 0)  # still a zombie: kill(0) succeeds — the old check
    proc.wait()
