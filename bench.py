"""Benchmark harness — streaming inference frames/sec/chip at 512x512.

This is the headline metric of BASELINE.json ("frames/sec/chip at 512x512
streaming seq inference"). The timed region is the FULL streaming pipeline
per frame on device: ULSTMnet2D step (flagship default architecture, bf16)
+ softmax + threshold + connected-component instance labeling + label
compaction, with the LSTM state carried across frames (donated buffers).

Baseline denominator: the reference publishes no throughput numbers
(BASELINE.json "published": {}) and the reference mount is empty, so per
BASELINE.md the denominator is our stack's own first JAX-CPU run
(single-thread host, recorded below as CPU_BASELINE_FPS). vs_baseline is
therefore this-run-fps / first-CPU-run-fps on the same workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# First JAX-CPU run of this workload (512x512, flagship arch, bf16, full
# pipeline: model step + softmax + CCL postprocess), measured on the build
# host (1 vCPU, XLA CPU): 3 frames in 100.84s — see BASELINE.md.
CPU_BASELINE_FPS = 0.0297


def _apply_probe(nkp, probe: str):
    """Config-only roofline probes (VERDICT r4 #8): clone the flagship with
    one region narrowed and bench UNTRAINED weights — a pure throughput
    probe locating where the 33->40 fps gap lives, never a quality claim.

    - half_enc0: encoder level 0 (ConvLSTM + down convs) channels halved —
      the full-resolution 512^2 encoder level, the biggest HBM working set
    - half_dec0: decoder level 0 conv stack halved — the full-resolution
      decoder level
    - half_l0:   both of the above
    """
    def halve(levels, i):
        levels[i] = [(k, f // 2) for k, f in levels[i]]

    if probe in ("half_enc0", "half_l0"):
        halve(nkp.lstm_kernels, 0)
        halve(nkp.down_conv_kernels, 0)
    if probe in ("half_dec0", "half_l0"):
        halve(nkp.up_conv_kernels, 0)
    if probe and probe not in ("half_enc0", "half_dec0", "half_l0"):
        raise ValueError(f"unknown probe {probe!r}")
    return nkp


def build_pipeline(size: int, dtype: str, tiny: bool, fused_cell: bool = False,
                   calibrated: bool = False, ccl_method: str = "sweep",
                   batch: int = 1, entry_layouts: bool = False,
                   int8_keep_float: str = "", probe: str = ""):
    from lstm_unet_tpu.config import default_net_kernel_params, tiny_net_kernel_params
    from lstm_unet_tpu.models import ModelConfig, ULSTMnet2D
    from lstm_unet_tpu.ops.postprocess import postprocess_frame

    nkp = tiny_net_kernel_params() if tiny else default_net_kernel_params()
    if probe:
        nkp = _apply_probe(nkp, probe)
    # 'int8': conv MXU ops int8xint8->int32 with dequant epilogues, bf16
    # elsewhere (ops/quant.py) — same mapping as engine.infer.load_model
    quant = "int8" if dtype == "int8" else "none"
    cfg = ModelConfig.make(nkp, dtype="bfloat16" if dtype == "int8" else dtype,
                           quant=quant, fused_cell=fused_cell)
    params = ULSTMnet2D.init(jax.random.PRNGKey(0), cfg)
    state = ULSTMnet2D.init_state(cfg, batch, size, size)

    # params must be an explicit argument: closed-over arrays are baked into
    # the HLO as constants (bloats the program and breaks remote compile)
    def step(params, state, frame):
        # full production streaming step: per-lane on-device normalize +
        # model + softmax + instance postprocess (same chain as
        # engine.infer); integer frames take the exact MXU-histogram
        # quantile. batch>1 = concurrent independent streams on one chip
        # (the serving configuration of engine.infer.run_inference_batched)
        def norm(f):  # [H,W,1]
            if jnp.issubdtype(f.dtype, jnp.integer):
                from lstm_unet_tpu.io.preprocess import integer_percentile_bounds

                lo, hi = integer_percentile_bounds(f[:, :, 0], 1.0, 99.0)
            else:
                lo, hi = jnp.percentile(
                    f.astype(jnp.float32).reshape(-1), jnp.array([1.0, 99.0]))
            return (f.astype(jnp.float32) - lo) / jnp.maximum(hi - lo, 1e-6)

        frame = jax.vmap(norm)(frame)
        new_state, logits = ULSTMnet2D.step(params, state, frame, cfg)
        probs = jax.nn.softmax(logits, axis=-1)
        labels = jax.vmap(lambda p: postprocess_frame(
            p, cell_thresh=0.5, edge_thresh=0.3, min_cell_size=10,
            grow_iters=3, ccl_method=ccl_method))(probs)
        return new_state, labels

    jitted = jax.jit(step, donate_argnums=(1,))
    # pre-cast/quantize weights once (same helpers the inference engine uses)
    if cfg.quant == "int8":
        from lstm_unet_tpu.ops.quant import quantize_params_int8

        act_scales = None
        if calibrated:
            # static activation scales from a short float-model pass over
            # the same synthetic distribution (engine.infer calibration)
            from lstm_unet_tpu.engine.infer import calibrate_act_scales
            from lstm_unet_tpu.io.synthetic import make_cell_sequence

            imgs, _ = make_cell_sequence(num_frames=4, height=size,
                                         width=size, num_cells=40, seed=7)
            act_scales = calibrate_act_scales(
                params, cfg, [f.astype(np.float32) for f in imgs])
        params = quantize_params_int8(params, act_scales,
                                      keep_float=int8_keep_float,
                                      float_dtype=cfg.compute_dtype)
    else:
        from lstm_unet_tpu.models.ulstm_unet import cast_params_for_inference

        params = cast_params_for_inference(params, cfg.compute_dtype)
    if entry_layouts:
        # AOT-compile with AUTO entry layouts for the weights and device_put
        # them into the executable's preferred formats ONCE — kills the
        # per-frame in-program re-layout of every conv kernel into its
        # blocked conv layout (part of the 8 ms/frame copy bill,
        # BASELINE.md r3). Same mechanism as engine.infer entry_layouts.
        from jax.experimental.layout import Format, Layout

        jauto = jax.jit(step, donate_argnums=(1,),
                        in_shardings=(Format(Layout.AUTO), None, None))
        sds = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)  # noqa: E731
        frame_sds = jax.ShapeDtypeStruct((batch, size, size, 1), jnp.uint16)
        comp = jauto.lower(jax.tree_util.tree_map(sds, params),
                           jax.tree_util.tree_map(sds, state),
                           frame_sds).compile()
        params = jax.device_put(params, comp.input_formats[0][0])
        return (lambda state, frame: comp(params, state, frame)), state
    params = jax.device_put(params)
    return (lambda state, frame: jitted(params, state, frame)), state


def make_frames(n: int, size: int, batch: int = 1) -> np.ndarray:
    from lstm_unet_tpu.io.synthetic import make_cell_sequence

    # raw uint16 frames, exactly what production streaming uploads: the
    # engine normalizes on device (integer frames take the MXU-histogram
    # quantile; the old bench normalized on the host AND re-normalized the
    # float result on device — double work and a 2x-wide upload).
    # batch>1: decorrelate the lanes by rolling each one down H — distinct
    # streams without B generator passes
    imgs, _ = make_cell_sequence(num_frames=n, height=size, width=size,
                                 num_cells=40, seed=7)
    frames = np.stack(imgs)[..., None, :, :, None]  # [n,1,H,W,1]
    if batch > 1:
        frames = np.concatenate(
            [np.roll(frames, (size // batch) * b, axis=2)
             for b in range(batch)], axis=1)
    return frames


# Per-chip peak for MFU accounting: TPU v5e (the bench chip) does 197
# TFLOP/s dense bf16 on the MXU (public spec). MFU below is
# HLO-counted flops (cost_analysis, i.e. INCLUDING remat recompute)
# per step over step-time x peak — the honest "of what the MXU could
# have done, how much did we do" number.
V5E_PEAK_BF16_FLOPS = 197e12


def bench_train(size: int, dtype: str, tiny: bool, steps: int = 10,
                emit: bool = True, remat="full", B: int = 5, T: int = 7,
                entry_layouts: bool = False, adam_mu_dtype: str = "float32",
                mfu: bool = False):
    """Training-step throughput (B5/T7 reference config, remat BPTT).

    With ``emit`` prints its own JSON line (--mode train); the default
    bench mode calls it with emit=False and folds the number into the
    headline JSON line as train_* keys so BENCH_r*.json records training
    throughput too (VERDICT r2 weak #1)."""
    import optax

    from lstm_unet_tpu.config import default_net_kernel_params, tiny_net_kernel_params
    from lstm_unet_tpu.engine.train import make_train_step
    from lstm_unet_tpu.models import ModelConfig, ULSTMnet2D

    nkp = tiny_net_kernel_params() if tiny else default_net_kernel_params()
    cfg = ModelConfig.make(nkp, dtype=dtype)
    params = ULSTMnet2D.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4, mu_dtype=(jnp.bfloat16 if adam_mu_dtype ==
                                     "bfloat16" else None))
    opt_state = opt.init(params)
    remat_arg = {"full": True, "none": False}.get(remat, remat)
    # B5/T7 is the reference-style config [M]; --train_batch/--train_unroll
    # override for throughput-scaling sweeps (frames/s amortizes per-step
    # overheads over B·T frames; quality semantics of T stay the trainer's)
    step = make_train_step(cfg, opt, (0.15, 0.25, 0.6), remat=remat_arg,
                           entry_layouts=entry_layouts)
    state = ULSTMnet2D.init_state(cfg, B, size, size)
    img = jnp.zeros((B, T, size, size, 1), jnp.float32) + 0.5
    seg = jnp.zeros((B, T, size, size), jnp.int32)
    ones = jnp.ones((B, T))
    last = jnp.zeros((B,))
    params, opt_state, state, m = step(params, opt_state, state, img, seg,
                                       ones, ones, last)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, state, m = step(params, opt_state, state, img,
                                           seg, ones, ones, last)
    float(m["loss"])
    dt = time.perf_counter() - t0
    fps = steps * B * T / dt
    out = {
        "metric": f"training frames/sec/chip @ {size}x{size} B{B} T{T} "
                  f"(flagship ULSTMnet2D, {dtype}, remat={remat} BPTT"
                  + (f", mu={adam_mu_dtype}" if adam_mu_dtype != "float32"
                     else "") + ")",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / CPU_BASELINE_FPS, 3),
    }
    if mfu:
        # HLO-counted flops of the EXECUTED program (includes remat
        # recompute) over measured step time x v5e bf16 peak. Abstract
        # .lower() avoids touching the donated live buffers; this is a
        # second compile (~30 s remote) so it is opt-in (--mfu).
        try:
            sds = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                (params, opt_state, state, img, seg, ones, ones, last))
            ca = step.lower(*sds).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) if ca else 0.0
            if flops > 0:
                step_s = dt / steps
                out["train_flops_per_step"] = flops
                out["train_mfu"] = round(
                    flops / step_s / V5E_PEAK_BF16_FLOPS, 4)
        except Exception as e:  # cost_analysis is best-effort diagnostics
            out["train_mfu_error"] = str(e)[:200]
    if emit:
        print(json.dumps(out))
    return fps, f"{size}x{size} B{B} T{T} {dtype} remat"


def _group_alive(pgid: int) -> bool:
    """True while any NON-ZOMBIE process remains in group ``pgid``.

    `os.killpg(pgid, 0)` keeps succeeding while the dead group leader is an
    unreaped zombie (its parent hasn't wait()ed yet), which made the TERM
    wait below spin out its whole deadline before SIGKILLing an already-dead
    group (ADVICE r3 low). Scan /proc states instead; fall back to killpg on
    any surprise.
    """
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    stat = f.read()
                # fields after the parenthesised comm: state, ppid, pgrp
                state, _, pgrp = stat.rsplit(")", 1)[1].split()[:3]
                if int(pgrp) == pgid and state != "Z":
                    return True
            except (OSError, ValueError):
                continue  # raced a process exit
        return False
    except OSError:
        try:
            os.killpg(pgid, 0)
            return True
        except ProcessLookupError:
            return False


def preempt_chip_lease(timeout_s: int = 150) -> None:
    """Evict a long-running chip workload so this bench can use the TPU.

    ONE process may use the tunneled chip at a time, and the round driver
    runs bench.py unconditionally. Long workloads (scripts/chip_pipeline.sh:
    training + eval queues, hours of chip time) cooperate by writing their
    process-GROUP id to runs/chip.lease; bench SIGTERMs the group, waits for
    it to exit, and proceeds. Nothing is lost: training checkpoints every
    500 steps and resumes with --continue_run, and the pipeline's eval
    stages skip work already marked done when it is relaunched.

    Set LSTM_UNET_NO_PREEMPT=1 to skip (manual benches next to a run you
    want to keep). Never matches our own group OR our own session: a bench
    launched from inside the pipeline under `timeout` gets a NEW process
    group (GNU timeout calls setpgid), so a pgid comparison alone would let
    the pipeline preempt — i.e. SIGTERM — itself (ADVICE r3 high). The
    pipeline also exports LSTM_UNET_NO_PREEMPT for belt and braces.
    """
    if os.environ.get("LSTM_UNET_NO_PREEMPT"):
        return
    lease = os.environ.get("LSTM_UNET_CHIP_LEASE") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "runs", "chip.lease")
    try:
        with open(lease) as f:
            pgid = int(f.read().strip())
    except (OSError, ValueError):
        return
    if pgid <= 1 or pgid == os.getpgid(0):
        return
    try:
        if os.getsid(pgid) == os.getsid(0):
            # The lease holder shares our session — a bench launched from
            # inside the pipeline must not evict it. Say so loudly: if the
            # pipeline was launched WITHOUT setsid from this same terminal,
            # this skip means bench and the lease holder will CONTEND for
            # the single-user chip (launch the pipeline per its header:
            # `setsid nohup bash scripts/chip_pipeline.sh ...`).
            print(f"bench: lease holder pgid={pgid} is in our own session "
                  "— not preempting (LSTM_UNET_NO_PREEMPT-equivalent skip)",
                  file=sys.stderr)
            return
    except (ProcessLookupError, PermissionError):
        pass  # leader already gone — fall through to stale-lease cleanup
    try:
        os.killpg(pgid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError):
        try:
            os.remove(lease)
        except OSError:
            pass
        return
    print(f"bench: preempting chip lease holder pgid={pgid} "
          f"(it resumes from checkpoints on relaunch)", file=sys.stderr)
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        time.sleep(2)
        if not _group_alive(pgid):
            break
    else:
        try:
            os.killpg(pgid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        time.sleep(5)
    try:
        os.remove(lease)
    except OSError:
        pass
    time.sleep(30)  # let the tunnel/runtime release the chip
    print("bench: chip lease cleared", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=512)
    # default = fastest config that holds SEG parity on the held-out
    # protocol (BASELINE.md round 2: int8 within 0.0025 SEG of bf16 on every
    # held-out sequence; calibrated static scales within 0.0010)
    ap.add_argument("--dtype", type=str, default="int8",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--fused_cell", action="store_true")
    ap.add_argument("--calibrated", action="store_true", default=True,
                    help="int8 with precalibrated static activation scales")
    ap.add_argument("--no-calibrated", dest="calibrated", action="store_false")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--mode", choices=["infer", "train"], default="infer")
    ap.add_argument("--train_too", action="store_true", default=True,
                    help="append train_* keys to the headline JSON line")
    ap.add_argument("--no-train_too", dest="train_too", action="store_false")
    ap.add_argument("--remat_policy", type=str, default="full",
                    choices=["full", "save_outputs", "none"])
    ap.add_argument("--train_batch", type=int, default=8,
                    help="training bench batch B. Default 8: the measured "
                         "throughput config (B8T7 41.2 f/s vs B5T7 24.7 on "
                         "v5e — step time is nearly batch-invariant at "
                         "B5->B8, BASELINE.md session 10). The reference "
                         "parity config is B5.")
    ap.add_argument("--train_unroll", type=int, default=7,
                    help="training bench BPTT unroll T (reference is T7)")
    ap.add_argument("--adam_mu_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="Adam first-moment storage dtype A/B (bf16 halves "
                         "mu bytes + per-step copy traffic)")
    ap.add_argument("--mfu", action="store_true",
                    help="train mode: also report HLO flops/step and MFU vs "
                         "the v5e bf16 peak (costs a second compile)")
    ap.add_argument("--ccl", type=str, default="sweep",
                    choices=["sweep", "scan"],
                    help="CCL variant for the fused A/B (bit-identical)")
    ap.add_argument("--int8_conv", type=str, default="conv",
                    choices=["conv", "dots", "auto"],
                    help="int8 conv lowering A/B: XLA conv (blocked layouts"
                         " + re-tiling copies) vs shifted-tap dot_general "
                         "(bit-identical, ops/quant.py::_conv_int8)")
    ap.add_argument("--int8_keep_float", type=str, default="",
                    help="mixed-precision int8: comma-separated site "
                         "prefixes kept bf16 (e.g. 'encoder/0')")
    ap.add_argument("--batch", type=int, default=1,
                    help="concurrent independent streams on the chip "
                         "(serving config); value = AGGREGATE frames/sec")
    ap.add_argument("--entry_layouts", action="store_true",
                    help="AOT-compile with AUTO entry layouts for the "
                         "weights (one-time relayout instead of per-frame "
                         "in-program conv-kernel copies) — A/B knob")
    ap.add_argument("--conv_method", type=str, default="conv",
                    choices=["conv", "dots", "auto"],
                    help="FLOAT conv lowering A/B (ops/conv.py): applies to "
                         "bf16 inference and the training step; 'dots' "
                         "replaces conv layout assignment (and the "
                         "conv-transpose grads in BPTT) with plain matmuls")
    ap.add_argument("--probe", type=str, default="",
                    choices=["", "half_enc0", "half_dec0", "half_l0"],
                    help="roofline probe: bench a config-only clone with the "
                         "named full-res region's channels halved (untrained "
                         "weights — throughput attribution only)")
    args = ap.parse_args()

    if args.int8_conv != "conv":
        from lstm_unet_tpu.ops import quant

        quant.INT8_CONV_METHOD = args.int8_conv
    if args.conv_method != "conv":
        from lstm_unet_tpu.ops import conv as conv_mod

        conv_mod.CONV_METHOD = args.conv_method

    preempt_chip_lease()
    try:
        run_bench(args)
    except RuntimeError as e:
        # A dead TPU backend (axon tunnel outage) must still yield ONE
        # parseable JSON line for the driver instead of a stack trace.
        msg = str(e)
        if "backend" not in msg and "UNAVAILABLE" not in msg:
            raise
        print(json.dumps({
            "metric": "streaming inference frames/sec/chip @ 512x512",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0.0,
            "error": "TPU backend unavailable: " + msg[:200],
        }))
        raise SystemExit(1)


def run_bench(args):
    if args.mode == "train":
        bench_train(256 if args.size == 512 else args.size,
                    "bfloat16" if args.dtype == "int8" else args.dtype,
                    args.tiny, remat=args.remat_policy,
                    B=args.train_batch, T=args.train_unroll,
                    entry_layouts=args.entry_layouts,
                    adam_mu_dtype=args.adam_mu_dtype, mfu=args.mfu)
        return

    step, state = build_pipeline(args.size, args.dtype, args.tiny,
                                 args.fused_cell, args.calibrated, args.ccl,
                                 args.batch, args.entry_layouts,
                                 args.int8_keep_float, args.probe)
    frames = make_frames(min(args.frames, 16), args.size, args.batch)
    dev_frames = [jax.device_put(jnp.asarray(f)) for f in frames]

    # warm-up: compile + 2 steady-state steps. NOTE: sync via a value fetch —
    # under the axon tunnel block_until_ready() returns before device
    # execution finishes, so timing must force a host round-trip.
    state, labels = step(state, dev_frames[0])
    state, labels = step(state, dev_frames[1 % len(dev_frames)])
    int(jnp.max(labels))

    t0 = time.perf_counter()
    for i in range(args.frames):
        state, labels = step(state, dev_frames[i % len(dev_frames)])
    # the final labels depend on every prior step through the state chain,
    # so one fetch syncs the whole timed region
    int(jnp.max(labels))
    dt = time.perf_counter() - t0

    fps = args.frames * args.batch / dt
    lanes = (f", {args.batch} concurrent streams aggregate"
             if args.batch > 1 else "")
    probe_tag = f", PROBE {args.probe}" if args.probe else ""
    out = {
        "metric": f"streaming inference frames/sec/chip @ {args.size}x{args.size} "
                  f"(flagship ULSTMnet2D, {args.dtype}, on-device postprocess"
                  f"{lanes}{probe_tag})",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / CPU_BASELINE_FPS, 3),
    }
    # fold training throughput into the SAME (single) JSON line so the
    # driver's one-line parse still works and BENCH_r*.json records both.
    # Skipped if the inference pass already ran pathologically slow (a
    # wedged tunnel: don't risk the headline on a second compile) or the
    # caller opted out.
    if args.train_too and fps > 1.0:
        try:
            tfps, tcfg = bench_train(
                256 if args.size == 512 else args.size,
                "bfloat16" if args.dtype == "int8" else args.dtype,
                args.tiny, steps=6, emit=False, remat=args.remat_policy,
                B=args.train_batch, T=args.train_unroll)
            out["train_value"] = round(tfps, 3)
            out["train_unit"] = "frames/sec/chip"
            out["train_config"] = tcfg
            if args.train_batch != 5:
                # ALSO record the B5 reference-parity denominator so
                # BENCH_r*.json stays longitudinally comparable across the
                # B5->B8 default change (ADVICE r3): train_value is the
                # throughput config, train_parity_value the parity config.
                pfps, pcfg = bench_train(
                    256 if args.size == 512 else args.size,
                    "bfloat16" if args.dtype == "int8" else args.dtype,
                    args.tiny, steps=6, emit=False, remat=args.remat_policy,
                    B=5, T=args.train_unroll)
                out["train_parity_value"] = round(pfps, 3)
                out["train_parity_config"] = pcfg
        except Exception as e:  # the headline metric survives
            out["train_error"] = str(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
