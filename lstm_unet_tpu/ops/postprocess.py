"""On-device instance-segmentation postprocess.

Reference parity: the per-frame host postprocess of ``Inference2D.py``
(SURVEY.md §3.2): threshold interior probability → connected components →
drop blobs < min_cell_size → grow labels into the boundary band → FOV border
rule → uint16 instance map. The reference does this in numpy/cv2 with a
GPU→CPU sync per frame; here the whole chain is one jitted device function
(BASELINE.json: "softmax, thresholding, and connected-component instance
labeling run on-device").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ccl import connected_components, relabel_compact
from .pallas.ccl import connected_components_pallas


def _neighbor_max(lbl: jax.Array) -> jax.Array:
    p = jnp.pad(lbl, 1, constant_values=0)
    h, w = lbl.shape
    out = lbl
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            out = jnp.maximum(out, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w)))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cell_thresh", "edge_thresh", "min_cell_size",
                     "max_cell_size", "fov", "grow_iters", "use_pallas_ccl"),
)
def postprocess_frame(
    probs: jax.Array,
    cell_thresh: float = 0.5,
    edge_thresh: float = 0.3,
    min_cell_size: int = 10,
    max_cell_size: int = 0,
    fov: int = 0,
    grow_iters: int = 3,
    use_pallas_ccl: bool = False,
) -> jax.Array:
    """3-class probabilities [H,W,3] → instance labels [H,W] int32.

    Steps (reference order, SURVEY.md §3.2 [M]):
      1. interior mask  = p(cell) > cell_thresh
      2. 8-connected components on interior
      3. drop components outside [min_cell_size, max_cell_size]
      4. grow surviving labels into the boundary band
         (pixels with p(boundary) > edge_thresh), `grow_iters` dilation rounds
      5. FOV rule: remove instances that never touch the interior region
         `fov` pixels in from every image border [M]
      6. compact to 1..N in raster order (cv2.connectedComponents order)
    """
    probs = probs.astype(jnp.float32)
    h, w = probs.shape[0], probs.shape[1]
    interior = probs[..., 1] > cell_thresh
    # The VMEM-resident Pallas CCL wins standalone (2.41 vs 3.29 ms @512^2,
    # bit-identical) but LOSES ~15% fused into the full streaming program
    # (pallas_call layout boundary serializes against model compute —
    # BASELINE.md), so the XLA twin is the default here.
    if use_pallas_ccl:
        raw = connected_components_pallas(interior)
    else:
        raw = connected_components(interior, connectivity=8)
    lbl, _ = relabel_compact(raw, min_size=min_cell_size, max_size=max_cell_size)

    if grow_iters > 0:
        band = (probs[..., 2] > edge_thresh) & ~interior
        def grow(_, cur):
            grown = jnp.where((cur == 0) & band, _neighbor_max(cur), cur)
            return grown
        lbl = jax.lax.fori_loop(0, grow_iters, grow, lbl)

    if fov > 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        inside = ((rows >= fov) & (rows < h - fov) & (cols >= fov) & (cols < w - fov))
        n = h * w + 1
        touches = jnp.zeros((n,), jnp.int32).at[
            jnp.where(inside, lbl, 0).reshape(-1)
        ].add(1)
        keep_mask = (touches > 0).at[0].set(False)
        lbl = jnp.where(keep_mask[lbl.reshape(-1)].reshape(h, w), lbl, 0)

    lbl, _ = relabel_compact(lbl)
    return lbl
