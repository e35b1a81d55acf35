"""lstm_unet_tpu — TPU-native recurrent (ConvLSTM) U-Net cell-segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``arbellea/LSTM-UNet`` (TF2/Keras reference; see SURVEY.md — the reference
mount was empty at survey time, so citations are file-level reconstructions):

- ``config``     — typed params (reference: Params.py)
- ``io``         — CTC TIFF ingestion + preprocessing (reference: DataHandeling.py)
- ``ops``        — compute kernels: ConvLSTM, convs, pooling, on-device
                   postprocess/CCL; Pallas TPU kernels + XLA fallbacks
- ``models``     — ULSTMnet2D equivalent (reference: Networks.py)
- ``engine``     — train / streaming-inference drivers (reference: train2D.py,
                   Inference2D.py)
- ``parallel``   — mesh/sharding (no reference analog: reference is single-GPU)
- ``metrics``    — SEG scorer + throughput harness
- ``checkpoint`` — orbax checkpointing (reference: tf.train.Checkpoint)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # Honor an explicit JAX_PLATFORMS=cpu request even under this
    # environment's sitecustomize, which force-prepends the experimental
    # 'axon' TPU platform to jax_platforms (the env var alone is otherwise
    # silently ignored — a CPU-requested CLI run would grab the chip).
    # No-op everywhere else: plain jax honors the env var natively.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception as _e:
        # A silent fallback to the axon TPU platform would make CPU-vs-chip
        # agreement runs compare chip-vs-chip (vacuous ~1.0 agreement) and
        # grab the single-user chip (ADVICE r3) — be loud about it.
        import sys as _sys

        print("lstm_unet_tpu: WARNING: JAX_PLATFORMS=cpu requested but "
              f"could not be honored ({_e!r}) — this process may use the "
              "TPU; CPU-vs-chip parity results from it are invalid",
              file=_sys.stderr)
