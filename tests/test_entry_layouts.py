"""AUTO entry-layout AOT path (engine/infer.py ``entry_layouts``).

The knob changes only WHERE layout conversion happens (weights re-laid-out
once at device_put instead of per-frame inside the program), never the
math: labels and probs must be bit-identical to the default jit path, the
donated-state streaming chain must survive multiple frames, and a frame
dtype change (raw uint16 vs float32) must recompile rather than crash.
"""
import numpy as np
import pytest

import jax

from lstm_unet_tpu.config import CTCInferenceParams, tiny_net_kernel_params
from lstm_unet_tpu.engine.infer import StreamingInferenceEngine
from lstm_unet_tpu.models import ModelConfig, ULSTMnet2D


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.make(tiny_net_kernel_params(), dtype="float32")
    params = ULSTMnet2D.init(jax.random.PRNGKey(3), cfg)
    return params, cfg


def _frames(n=4, size=64, seed=9, dtype=np.float32):
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.integer):
        return [rng.integers(0, 4000, (size, size)).astype(dtype)
                for _ in range(n)]
    return [rng.normal(0.5, 0.2, (size, size)).astype(dtype)
            for _ in range(n)]


def test_entry_layouts_bit_identical_stream(model):
    params, cfg = model
    kw = dict(save_intermediate=True, min_cell_size=3, dtype="float32")
    ref = StreamingInferenceEngine(params, cfg, CTCInferenceParams(**kw))
    aot = StreamingInferenceEngine(
        params, cfg, CTCInferenceParams(entry_layouts=True, **kw))
    for frame in _frames():
        m_ref, p_ref = ref.process_frame(frame)
        m_aot, p_aot = aot.process_frame(frame)
        np.testing.assert_array_equal(m_ref, m_aot)
        np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_aot))


def test_entry_layouts_recompiles_on_dtype_change(model):
    params, cfg = model
    ip = CTCInferenceParams(entry_layouts=True, min_cell_size=3,
                            dtype="float32")
    eng = StreamingInferenceEngine(params, cfg, ip)
    f32 = _frames(2)
    u16 = _frames(2, dtype=np.uint16)
    m1, _ = eng.process_frame(f32[0])
    m2, _ = eng.process_frame(u16[0])      # new signature -> new executable
    m3, _ = eng.process_frame(f32[1])      # cached executable reused
    assert m1.shape == m2.shape == m3.shape == (64, 64)

    # raw-integer stream equals the default path on the same stream
    ref = StreamingInferenceEngine(
        params, cfg, CTCInferenceParams(min_cell_size=3, dtype="float32"))
    eng2 = StreamingInferenceEngine(params, cfg, ip)
    for frame in u16:
        a, _ = ref.process_frame(frame)
        b, _ = eng2.process_frame(frame)
        np.testing.assert_array_equal(a, b)


def test_entry_layouts_train_step_bit_identical(model):
    import jax.numpy as jnp
    import optax

    from lstm_unet_tpu.engine.train import make_train_step

    _, cfg = model
    B, T, S = 2, 3, 32
    img = jnp.ones((B, T, S, S, 1)) * 0.5
    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.integers(0, 3, (B, T, S, S)), np.int32)
    ones = jnp.ones((B, T))
    last = jnp.zeros((B,))

    losses = {}
    for mode in (False, True):
        params = ULSTMnet2D.init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        state = ULSTMnet2D.init_state(cfg, B, S, S)
        step = make_train_step(cfg, opt, (0.15, 0.25, 0.6), remat=False,
                               entry_layouts=mode)
        ls = []
        for _ in range(3):
            params, opt_state, state, m = step(params, opt_state, state,
                                               img, seg, ones, ones, last)
            ls.append(float(m["loss"]))
        losses[mode] = ls
    # layout is where bytes sit, never what they are — bit-identical
    assert losses[False] == losses[True]


def test_trainer_entry_layouts_trains_and_checkpoints(tmp_path):
    """Trainer-level wiring: AUTO-formatted params survive the train loop
    AND orbax checkpointing (save sees arrays in executable-chosen
    formats), and the restored model runs inference."""
    import glob as _glob
    import os

    from lstm_unet_tpu.config import CTCParams
    from lstm_unet_tpu.engine.infer import run_inference
    from lstm_unet_tpu.engine.train import Trainer
    from lstm_unet_tpu.io.synthetic import write_ctc_dataset

    root = str(tmp_path / "data")
    write_ctc_dataset(root, num_frames=8, height=32, width=32)
    p = CTCParams(
        root_data_dir=root,
        train_sequence_list=[("Synth-N2DH-SIM", "01")],
        val_sequence_list=[("Synth-N2DH-SIM", "01")],
        crop_size=(32, 32), batch_size=2, unroll_len=3,
        net_kernel_params=tiny_net_kernel_params(),
        root_save_dir=str(tmp_path / "save"),
        print_to_console_interval=50, validation_interval=10000,
        save_checkpoint_iteration=10000, write_to_tb_interval=10000,
        num_prefetch_threads=1,
        entry_layouts=True,
    )
    trainer = Trainer(p, seed=0)
    first = trainer.train(num_iterations=2)
    late = trainer.train(num_iterations=40)
    assert late["loss"] < first["loss"], (first, late)

    out = str(tmp_path / "res")
    n = run_inference(CTCInferenceParams(
        model_path=p.experiment_save_dir,
        sequence_path=os.path.join(root, "Synth-N2DH-SIM", "01"),
        output_path=out, pre_sequence_frames=2, min_cell_size=5,
        dtype="float32", entry_layouts=True))
    assert n == 8
    assert len(_glob.glob(os.path.join(out, "mask*.tif"))) == 8
