"""GrainCTCReaderSequence2D — deterministic/resumable input pipeline."""

import numpy as np
import pytest

from lstm_unet_tpu.config import CTCParams, tiny_net_kernel_params
from lstm_unet_tpu.io.grain_reader import GrainCTCReaderSequence2D
from lstm_unet_tpu.io.synthetic import write_ctc_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ctc"))
    write_ctc_dataset(root, num_frames=10, height=32, width=32, num_cells=3,
                      seed=4)
    return root


def _params(root, **kw):
    defaults = dict(
        root_data_dir=root,
        train_sequence_list=[("Synth-N2DH-SIM", "01")],
        crop_size=(24, 24), batch_size=2, unroll_len=3, dry_run=True,
        net_kernel_params=tiny_net_kernel_params(),
        data_provider_class="GrainCTCReaderSequence2D")
    defaults.update(kw)
    return CTCParams(**defaults)


def _collect(reader, n):
    reader.start_queues()
    out = [reader.get_batch() for _ in range(n)]
    reader.stop()
    return out


def test_grain_batches_deterministic(synth_root):
    a = _collect(GrainCTCReaderSequence2D(_params(synth_root), seed=3), 5)
    b = _collect(GrainCTCReaderSequence2D(_params(synth_root), seed=3), 5)
    for ba, bb in zip(a, b):
        for xa, xb in zip(ba, bb):
            np.testing.assert_array_equal(xa, xb)
    # different seed -> different stream (photometric jitter at least)
    c = _collect(GrainCTCReaderSequence2D(_params(synth_root), seed=4), 1)
    assert not np.array_equal(a[0][0], c[0][0])


def test_grain_resume_mid_stream(synth_root):
    """set_start_step(k) reproduces the k-th batch of a fresh stream —
    the input-pipeline resumability the threaded reader cannot offer."""
    full = _collect(GrainCTCReaderSequence2D(_params(synth_root), seed=3), 7)
    r = GrainCTCReaderSequence2D(_params(synth_root), seed=3)
    r.set_start_step(4)
    resumed = _collect(r, 3)
    for ba, bb in zip(full[4:], resumed):
        for xa, xb in zip(ba, bb):
            np.testing.assert_array_equal(xa, xb)


def test_grain_contract_and_is_last(synth_root):
    """Same batch contract as the threaded reader: shapes, classes, and the
    is_last schedule (10 frames / unroll 3 -> last window of a traversal
    flags is_last)."""
    r = GrainCTCReaderSequence2D(_params(synth_root), seed=0)
    batches = _collect(r, 8)
    img, seg, valid, full_seg, is_last = batches[0]
    assert img.shape == (2, 3, 24, 24, 1) and seg.shape == (2, 3, 24, 24)
    assert sorted(np.unique(seg).tolist()) <= [0, 1, 2]
    # every lane must hit a sequence end within ceil(10/3)=4 windows
    lasts = np.stack([b[4] for b in batches])  # [steps, lanes]
    assert np.all(lasts[:4].sum(axis=0) >= 1)


def test_grain_trainer_integration(synth_root, tmp_path):
    from lstm_unet_tpu.engine.train import Trainer

    p = _params(synth_root, dry_run=False, learning_rate=3e-3,
                root_save_dir=str(tmp_path),
                print_to_console_interval=20, validation_interval=10**6,
                save_checkpoint_iteration=10**6, write_to_tb_interval=10**6)
    t = Trainer(p, seed=0)
    first = t.train(num_iterations=2)
    late = t.train(num_iterations=40)
    assert late["loss"] < first["loss"]


def test_grain_relaunch_replays_stream_threaded_does_not(synth_root, tmp_path,
                                                         monkeypatch):
    """Trainer-level replay (VERDICT r4 #3 done-criterion, CPU mechanism
    pin): a continue_run relaunch with the grain provider consumes EXACTLY
    the batches the uninterrupted run would have consumed at the same step
    indices (Trainer passes set_start_step(global_step) after restore).
    The threaded reader demonstrably cannot — its relaunch restarts the
    traversal schedule from the beginning.
    """
    import hashlib

    from lstm_unet_tpu.engine import train as train_mod
    from lstm_unet_tpu.engine.train import Trainer
    from lstm_unet_tpu.io.dataset import CTCRAMReaderSequence2D

    rec = {"cur": []}

    def recording(base):
        class Recording(base):
            def get_batch(self):
                b = super().get_batch()
                rec["cur"].append(hashlib.sha1(
                    np.ascontiguousarray(b[0]).tobytes()).hexdigest())
                return b
        return Recording

    monkeypatch.setitem(train_mod.DATA_PROVIDERS,
                        "GrainCTCReaderSequence2D",
                        recording(GrainCTCReaderSequence2D))
    monkeypatch.setitem(train_mod.DATA_PROVIDERS,
                        "CTCRAMReaderSequence2D",
                        recording(CTCRAMReaderSequence2D))

    def run(provider, name, segments):
        """Train ``segments`` (list of step counts) with a fresh Trainer per
        segment (relaunch semantics: continue_run after the first)."""
        hashes = []
        base = dict(dry_run=False, learning_rate=3e-3,
                    root_save_dir=str(tmp_path / name),
                    data_provider_class=provider,
                    print_to_console_interval=10**6,
                    validation_interval=10**6,
                    save_checkpoint_iteration=5, write_to_tb_interval=10**6)
        dirs = {}
        for i, n in enumerate(segments):
            kw = dict(base)
            if i > 0:
                kw["continue_run"] = True
            p = _params(synth_root, **kw)
            if i > 0:
                p.experiment_log_dir = dirs["log"]
                p.experiment_save_dir = dirs["save"]
            t = Trainer(p, seed=0)
            dirs = {"log": p.experiment_log_dir, "save": p.experiment_save_dir}
            rec["cur"] = []
            t.train(num_iterations=n)
            hashes.append(list(rec["cur"]))
        return hashes

    (full,) = run("GrainCTCReaderSequence2D", "g_full", [10])
    g1, g2 = run("GrainCTCReaderSequence2D", "g_split", [5, 5])
    assert g1 == full[:5]            # same seed -> same prefix
    assert g2 == full[5:]            # the relaunch REPLAYS the stream

    (tfull,) = run("CTCRAMReaderSequence2D", "t_full", [10])
    t1, t2 = run("CTCRAMReaderSequence2D", "t_split", [5, 5])
    assert t1 == tfull[:5]           # deterministic within one launch
    assert t2 != tfull[5:]           # but the relaunch RESTARTS the schedule
    assert t2 == tfull[:5]           # ... from the beginning
