"""TF TensorBundle reader/writer + Keras weight importer.

The image has no TensorFlow, so the reader is validated against bundles
produced by this package's own spec-implemented writer (tf_bundle.write_
bundle) plus hand-built wire-format cases (snappy blocks, prefix
compression, crc), and the importer against a fabricated TF2 object-graph
checkpoint with Keras-style paths.
"""

import numpy as np
import pytest

from lstm_unet_tpu.checkpoint.tf_bundle import (
    TFBundle, TableWriter, crc32c, masked_crc32c, read_table,
    snappy_decompress, write_bundle, _write_varint)
from lstm_unet_tpu.checkpoint.tf_import import (
    export_tf_bundle, import_keras_ulstm, load_tf_variables)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_snappy_literal_and_copy():
    # literal "abcd" then a 4-byte copy at offset 4 -> "abcdabcd":
    # uncompressed length varint (8), literal tag ((len-1)<<2 | 0), data,
    # copy-1 tag (((len-4)&7)<<2 | 1 with offset high bits <<5), offset byte
    payload = bytes([8, (3 << 2) | 0]) + b"abcd" + bytes([1, 4])
    assert snappy_decompress(payload) == b"abcdabcd"


def test_table_roundtrip_many_keys(tmp_path):
    # enough keys to force several blocks, restarts, and prefix compression
    items = {f"layer_{i:04d}/weights/kernel".encode(): bytes([i % 256]) * (i % 50 + 1)
             for i in range(500)}
    path = str(tmp_path / "table")
    w = TableWriter(path)
    for k in sorted(items):
        w.add(k, items[k])
    w.finish()
    out = read_table(path, verify_crc=True)
    assert out == items


def test_table_rejects_corruption(tmp_path):
    path = str(tmp_path / "table")
    w = TableWriter(path)
    w.add(b"a", b"1")
    w.finish()
    data = bytearray(open(path, "rb").read())
    data[0] ^= 0xFF
    open(path, "wb").write(data)
    with pytest.raises(ValueError, match="crc"):
        read_table(path, verify_crc=True)


def test_bundle_roundtrip_dtypes(tmp_path):
    import ml_dtypes

    prefix = str(tmp_path / "ckpt")
    tensors = {
        "a/kernel": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
        "a/bias": np.arange(4, dtype=np.float64),
        "b/steps": np.array(7, dtype=np.int64),
        "b/flags": np.array([True, False]),
        "c/half": np.linspace(-1, 1, 8, dtype=np.float16),
        "c/bf16": np.linspace(-2, 2, 8).astype(ml_dtypes.bfloat16),
    }
    write_bundle(prefix, tensors)
    bundle = TFBundle.open(prefix)
    assert bundle.num_shards == 1
    names = [n for n, _ in bundle.list_variables()]
    assert names == sorted(tensors)
    for name, ref in tensors.items():
        got = bundle.load(name, verify_crc=True)
        assert got.dtype == ref.dtype and got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def _fake_tf2_checkpoint(prefix, params, extra_optimizer_slots=True):
    """Fabricate a TF2 object-graph checkpoint for the same architecture:
    Keras-style paths, ``/.ATTRIBUTES/VARIABLE_VALUE`` suffixes, optimizer
    slot-variable keys that must be ignored."""
    rng = np.random.default_rng(0)
    tensors = {}
    tf_values = {}

    def add(path, shape):
        v = rng.normal(size=shape).astype(np.float32)
        tensors[path + "/.ATTRIBUTES/VARIABLE_VALUE"] = v
        if extra_optimizer_slots:
            tensors[path + "/.OPTIMIZER_SLOT/optimizer/m"
                    "/.ATTRIBUTES/VARIABLE_VALUE"] = np.zeros(shape, np.float32)
        tf_values[path] = v
        return v

    for lvl, level in enumerate(params["encoder"]):
        for j, cell in enumerate(level["lstm"]):
            base = f"net/down_blocks/{lvl}/lstm_layers/{j}/cell"
            add(f"{base}/kernel", cell["kernel_x"].shape)
            add(f"{base}/recurrent_kernel", cell["kernel_h"].shape)
            add(f"{base}/bias", cell["bias"].shape)
        for j, conv in enumerate(level["convs"]):
            base = f"net/down_blocks/{lvl}/conv_layers/{j}"
            add(f"{base}/kernel", conv["kernel"].shape)
            add(f"{base}/bias", conv["bias"].shape)
    for lvl, level in enumerate(params["decoder"]):
        for j, conv in enumerate(level["convs"]):
            base = f"net/up_blocks/{lvl}/conv_layers/{j}"
            add(f"{base}/kernel", conv["kernel"].shape)
            add(f"{base}/bias", conv["bias"].shape)
    add("net/head_conv/kernel", params["head"]["kernel"].shape)
    add("net/head_conv/bias", params["head"]["bias"].shape)
    tensors["save_counter/.ATTRIBUTES/VARIABLE_VALUE"] = np.array(1, np.int64)
    write_bundle(prefix, tensors)
    return tf_values


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from lstm_unet_tpu.config import tiny_net_kernel_params
    from lstm_unet_tpu.models import ModelConfig, ULSTMnet2D

    cfg = ModelConfig.make(tiny_net_kernel_params())
    params = ULSTMnet2D.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_bundle_multi_shard_read(tmp_path):
    """Real TF checkpoints can span several .data-XXXXX-of-NNNNN shards;
    the reader resolves shard_id per entry (writer emits single-shard, so
    the shard files + index are fabricated here)."""
    from lstm_unet_tpu.checkpoint.tf_bundle import (
        TableWriter, _emit_field, masked_crc32c)

    prefix = str(tmp_path / "ms.ckpt")
    a = np.arange(6, dtype=np.float32)
    b = np.arange(8, dtype=np.int32).reshape(2, 4)
    open(f"{prefix}.data-00000-of-00002", "wb").write(a.tobytes())
    open(f"{prefix}.data-00001-of-00002", "wb").write(b.tobytes())

    w = TableWriter(prefix + ".index")
    header = _emit_field(1, 0, 2)  # num_shards = 2
    w.add(b"", header)

    def entry(dtype_code, shape, shard, size, buf):
        msg = _emit_field(1, 0, dtype_code)
        dims = b"".join(_emit_field(2, 2, _emit_field(1, 0, d)) for d in shape)
        msg += _emit_field(2, 2, dims)
        if shard:
            msg += _emit_field(3, 0, shard)
        msg += _emit_field(5, 0, size)
        msg += _emit_field(6, 0, masked_crc32c(buf))
        return msg

    w.add(b"alpha", entry(1, (6,), 0, a.nbytes, a.tobytes()))
    w.add(b"beta", entry(3, (2, 4), 1, b.nbytes, b.tobytes()))
    w.finish()

    bundle = TFBundle.open(prefix)
    assert bundle.num_shards == 2
    np.testing.assert_array_equal(bundle.load("alpha", verify_crc=True), a)
    np.testing.assert_array_equal(bundle.load("beta", verify_crc=True), b)


def test_import_keras_checkpoint(tmp_path, tiny_model):
    cfg, params = tiny_model
    prefix = str(tmp_path / "tf_ckpt")
    tf_values = _fake_tf2_checkpoint(prefix, params)

    variables = load_tf_variables(prefix)
    assert "save_counter" not in variables
    assert not any(".OPTIMIZER_SLOT" in k for k in variables)

    imported, report = import_keras_ulstm(prefix, params)
    # every slot mapped, and mapped to the right fabricated layer
    assert report["encoder[0].lstm[0]"] == "net/down_blocks/0/lstm_layers/0/cell"
    assert report["head"] == "net/head_conv"
    np.testing.assert_array_equal(
        imported["encoder"][0]["lstm"][0]["kernel_x"],
        tf_values["net/down_blocks/0/lstm_layers/0/cell/kernel"])
    np.testing.assert_array_equal(
        imported["encoder"][0]["lstm"][0]["kernel_h"],
        tf_values["net/down_blocks/0/lstm_layers/0/cell/recurrent_kernel"])
    np.testing.assert_array_equal(
        imported["decoder"][0]["convs"][0]["kernel"],
        tf_values["net/up_blocks/0/conv_layers/0/kernel"])

    # the imported tree must run: forward a frame
    import jax
    import jax.numpy as jnp

    from lstm_unet_tpu.models import ULSTMnet2D

    imported = jax.tree_util.tree_map(jnp.asarray, imported)
    state = ULSTMnet2D.init_state(cfg, 1, 16, 16)
    _, logits = ULSTMnet2D.step(imported, state, jnp.ones((1, 16, 16, 1)), cfg)
    assert logits.shape == (1, 16, 16, cfg.num_classes)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_import_shape_mismatch_fails_loudly(tmp_path, tiny_model):
    cfg, params = tiny_model
    prefix = str(tmp_path / "tf_ckpt")
    _fake_tf2_checkpoint(prefix, params)
    # ask for a DIFFERENT architecture -> must raise, not misassign
    import jax

    from lstm_unet_tpu.config import NetKernelParams
    from lstm_unet_tpu.models import ModelConfig, ULSTMnet2D

    other = ModelConfig.make(NetKernelParams(
        lstm_kernels=[[(3, 12)]], down_conv_kernels=[[(3, 12)]],
        up_conv_kernels=[[(3, 12)]]))
    wrong = ULSTMnet2D.init(jax.random.PRNGKey(0), other)
    with pytest.raises(ValueError, match="no TF layer matches"):
        import_keras_ulstm(prefix, wrong)


def test_import_tf_cli_end_to_end(tmp_path, tiny_model):
    """Fabricated TF ckpt -> import_tf CLI -> load_model -> forward step."""
    import json

    import jax
    import jax.numpy as jnp

    from lstm_unet_tpu.cli.import_tf import main as import_main
    from lstm_unet_tpu.config import tiny_net_kernel_params
    from lstm_unet_tpu.engine.infer import load_model
    from lstm_unet_tpu.models import ULSTMnet2D

    cfg, params = tiny_model
    prefix = str(tmp_path / "tf" / "model.ckpt")
    (tmp_path / "tf").mkdir()
    tf_values = _fake_tf2_checkpoint(prefix, params)
    out_dir = str(tmp_path / "imported")
    nkp_json = json.dumps(tiny_net_kernel_params().to_dict())
    import_main(["--tf_prefix", prefix, "--output_dir", out_dir,
                 "--net_kernel_params", nkp_json])

    loaded, lcfg = load_model(out_dir)
    np.testing.assert_array_equal(
        np.asarray(loaded["head"]["kernel"], dtype=np.float32),
        tf_values["net/head_conv/kernel"])
    state = ULSTMnet2D.init_state(lcfg, 1, 16, 16)
    _, logits = ULSTMnet2D.step(loaded, state, jnp.ones((1, 16, 16, 1)), lcfg)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_export_roundtrip(tmp_path, tiny_model):
    cfg, params = tiny_model
    prefix = str(tmp_path / "export")
    export_tf_bundle(prefix, params)
    bundle = TFBundle.open(prefix)
    got = bundle.load("encoder/0/lstm/0/kernel_x")
    np.testing.assert_allclose(
        got, np.asarray(params["encoder"][0]["lstm"][0]["kernel_x"],
                        dtype=np.float32))
