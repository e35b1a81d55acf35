"""Import reference (TF2/Keras) pretrained weights into ULSTMnet2D params.

Reference parity: the reference README points at downloadable pretrained
models saved with ``tf.train.Checkpoint`` (SURVEY.md §2 "README/docs" [M],
§5 "Checkpoint / resume"); this importer lets a reference user bring those
weights to the TPU stack. SURVEY.md §5 lists this as the optional/stretch
converter; behavior-level parity does NOT depend on it.

TF2 object-based checkpoints key every variable by its path through the
object graph, suffixed ``/.ATTRIBUTES/VARIABLE_VALUE`` (optimizer slots get
``/.OPTIMIZER_SLOT/...`` segments). The reference's exact attribute names
are unverifiable (empty reference mount — SURVEY.md provenance warning), so
the mapping is structural rather than name-exact:

1. group variables by parent path -> "layers";
2. classify each layer by its weight set (``recurrent_kernel`` present =>
   ConvLSTM2D; 4-D ``kernel`` + ``bias`` => Conv2D);
3. walk OUR param tree in construction order (encoder levels: LSTMs then
   convs; decoder levels; head — the same creation order as the reference's
   Networks.py [M]) and greedily consume the unique TF layer whose shapes
   match, breaking ties by natural path order (Keras auto-names creation
   order: ``conv2d``, ``conv2d_1``, ...).

Keras ConvLSTM2D and ops/convlstm.py::ConvLSTMCell share layout exactly:
kernel [kh,kw,cin,4F] / recurrent_kernel [kh,kw,F,4F] / bias [4F], gate
order (i, f, candidate, o) — so tensors transfer without permutation.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from .tf_bundle import TFBundle

_VAR_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def load_tf_variables(prefix: str) -> Dict[str, np.ndarray]:
    """All model variables {object_path: array} (optimizer slots excluded)."""
    bundle = TFBundle.open(prefix)
    out: Dict[str, np.ndarray] = {}
    for name in bundle.entries:
        if not name.endswith(_VAR_SUFFIX) or "/.OPTIMIZER_SLOT" in name:
            continue
        path = name[: -len(_VAR_SUFFIX)]
        if path.split("/")[0] in ("optimizer", "save_counter"):
            continue
        out[path] = bundle.load(name)
    return out


def _group_layers(variables: Dict[str, np.ndarray]
                  ) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """Group variables by parent path, natural-sorted: one group per layer."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for path, arr in variables.items():
        parent, leaf = path.rsplit("/", 1)
        groups.setdefault(parent, {})[leaf] = arr
    return sorted(groups.items(), key=lambda kv: _natural_key(kv[0]))


def _take(layers, kind: str, shapes: Dict[str, tuple], context: str):
    """Pop the first unconsumed layer whose weight-set matches ``shapes``.

    Exact key-set equality is required (a ConvLSTM group must not be
    consumed as a Conv2D just because its kernel/bias happen to fit)."""
    for i, (path, weights) in enumerate(layers):
        if set(weights) != set(shapes):
            continue
        if all(weights[k].shape == tuple(s) for k, s in shapes.items()):
            layers.pop(i)
            return path, weights
    raise ValueError(
        f"no TF layer matches {context} ({kind} with shapes {shapes}); "
        f"remaining layers: "
        f"{[(p, {k: v.shape for k, v in w.items()}) for p, w in layers]}")


def import_keras_ulstm(prefix: str, params) -> Tuple[dict, Dict[str, str]]:
    """Map a TF2 checkpoint onto an ULSTMnet2D param tree.

    ``params`` supplies the target structure/shapes (e.g. from
    ``ULSTMnet2D.init``); returns (new params with TF values as f32 numpy,
    report {our_slot: tf_layer_path}). Raises with a full shape listing when
    the architectures disagree — a wrong ``net_kernel_params`` should fail
    loudly, not misassign layers.
    """
    variables = load_tf_variables(prefix)
    layers = _group_layers(variables)
    report: Dict[str, str] = {}

    def conv_slot(conv: dict, slot: str) -> dict:
        k = np.asarray(conv["kernel"])
        path, w = _take(layers, "Conv2D",
                        {"kernel": k.shape, "bias": conv["bias"].shape},
                        slot)
        report[slot] = path
        out = dict(conv)
        out["kernel"] = w["kernel"].astype(np.float32)
        out["bias"] = w["bias"].astype(np.float32)
        return out

    new = {"encoder": [], "decoder": [], "head": None}
    for lvl, level in enumerate(params["encoder"]):
        new_level = {"lstm": [], "convs": []}
        for j, cell in enumerate(level["lstm"]):
            slot = f"encoder[{lvl}].lstm[{j}]"
            path, w = _take(
                layers, "ConvLSTM2D",
                {"kernel": cell["kernel_x"].shape,
                 "recurrent_kernel": cell["kernel_h"].shape,
                 "bias": cell["bias"].shape}, slot)
            report[slot] = path
            new_level["lstm"].append({
                "kernel_x": w["kernel"].astype(np.float32),
                "kernel_h": w["recurrent_kernel"].astype(np.float32),
                "bias": w["bias"].astype(np.float32),
            })
        for j, conv in enumerate(level["convs"]):
            new_level["convs"].append(
                conv_slot(conv, f"encoder[{lvl}].convs[{j}]"))
        new["encoder"].append(new_level)
    for lvl, level in enumerate(params["decoder"]):
        new["decoder"].append({"convs": [
            conv_slot(conv, f"decoder[{lvl}].convs[{j}]")
            for j, conv in enumerate(level["convs"])
        ]})
    new["head"] = conv_slot(params["head"], "head")
    return new, report


def export_tf_bundle(prefix: str, params) -> None:
    """Reverse interop: write ULSTMnet2D params as a TF-readable bundle.

    Keys are flat slot paths (``encoder/0/lstm/0/kernel_x`` ...) — loadable
    with ``tf.train.load_checkpoint(prefix).get_tensor(key)``.
    """
    from .tf_bundle import write_bundle

    tensors: Dict[str, np.ndarray] = {}

    def walk(node, path: str):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}" if path else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}")
        elif node is not None:
            tensors[path] = np.asarray(node, dtype=np.float32)

    walk(params, "")
    write_bundle(prefix, tensors)
