"""StallWatchdog unit tests (lstm_unet_tpu/utils/watchdog.py).

The abort action is injected so no test ever os._exit()s the pytest
process; the default action is only checked for its exit-code constant.
"""
import threading
import time

import pytest

from lstm_unet_tpu.utils.watchdog import StallWatchdog, STALL_EXIT_CODE


def test_fires_when_not_fed():
    fired = threading.Event()
    stalls = []

    def on_stall(stalled_for):
        stalls.append(stalled_for)
        fired.set()

    wd = StallWatchdog(0.2, label="t", on_stall=on_stall).start()
    try:
        assert fired.wait(3.0), "watchdog never fired"
        assert stalls and stalls[0] > 0.2
    finally:
        wd.stop()


def test_feeding_prevents_firing():
    fired = threading.Event()
    wd = StallWatchdog(0.4, label="t",
                       on_stall=lambda s: fired.set()).start()
    try:
        for _ in range(8):  # 0.8 s total, fed every 0.1 s
            time.sleep(0.1)
            wd.feed()
        assert not fired.is_set()
    finally:
        wd.stop()


def test_first_timeout_grace_covers_compile():
    """Before the FIRST feed() the larger first_timeout_s window applies
    (the first jitted step's remote compile produces no progress signal —
    a 600 s watchdog killed a healthy 628x690 eval whose compile ran
    longer, r4); after one feed the normal timeout takes over."""
    fired = threading.Event()
    wd = StallWatchdog(0.2, label="t", first_timeout_s=1.0,
                       on_stall=lambda s: fired.set()).start()
    try:
        time.sleep(0.5)  # > timeout_s, < first_timeout_s: must NOT fire
        assert not fired.is_set(), "fired during the first-compile grace"
        wd.feed()
        assert fired.wait(3.0), "normal timeout never engaged after feed"
    finally:
        wd.stop()


def test_stop_disarms():
    fired = threading.Event()
    wd = StallWatchdog(0.2, label="t",
                       on_stall=lambda s: fired.set()).start()
    wd.stop()
    time.sleep(0.5)
    assert not fired.is_set()


def test_context_manager_and_validation():
    with StallWatchdog(5.0, on_stall=lambda s: None) as wd:
        wd.feed()
    with pytest.raises(ValueError):
        StallWatchdog(0.0)
    assert STALL_EXIT_CODE == 17


def test_trainer_param_plumbed():
    # the CTCParams knob exists, defaults off, and the CLI exposes it
    from lstm_unet_tpu.config import CTCParams
    from lstm_unet_tpu.cli.train2d import build_parser
    assert CTCParams().watchdog_secs == 0.0
    args = build_parser().parse_args(["--watchdog_secs", "900"])
    assert args.watchdog_secs == 900.0


def test_trainer_runs_clean_with_watchdog(tmp_path):
    # armed watchdog through a real (tiny, dry_run) training loop: no
    # spurious firing, clean disarm on exit
    from lstm_unet_tpu.config import CTCParams, tiny_net_kernel_params
    from lstm_unet_tpu.engine.train import Trainer
    from lstm_unet_tpu.io.synthetic import write_ctc_dataset

    root = str(tmp_path / "ctc")
    write_ctc_dataset(root, num_frames=6, height=32, width=32, num_cells=2,
                      seed=3)
    p = CTCParams(
        root_data_dir=root,
        train_sequence_list=[("Synth-N2DH-SIM", "01")],
        crop_size=(32, 32), batch_size=1, unroll_len=2,
        net_kernel_params=tiny_net_kernel_params(),
        root_save_dir=str(tmp_path), dry_run=True,
        print_to_console_interval=100, validation_interval=10000,
        save_checkpoint_iteration=10000, write_to_tb_interval=10000,
        num_prefetch_threads=1, watchdog_secs=120.0)
    t = Trainer(p, seed=0)
    out = t.train(num_iterations=3)
    assert "loss" in out


def test_rss_gb_reads_proc():
    """rss_gb() reports this process's real VmRSS: positive, plausibly
    bounded, and consistent with a direct /proc read (the trainer's
    host-RSS relaunch guard trusts this number)."""
    from lstm_unet_tpu.utils.watchdog import rss_gb

    v = rss_gb()
    assert 0.001 < v < 200.0, v
    with open("/proc/self/status") as f:
        kb = next(int(l.split()[1]) for l in f if l.startswith("VmRSS:"))
    assert abs(v - kb / 1e6) < 0.5  # same ballpark (allocs between reads)
