"""Instance splitting of merged/touching cells (VERDICT r2 task #1).

`ops/postprocess.py::split_touching_instances` partitions merged CCL
components along the distance-transform ridge between regional maxima. The
NumPy twin below mirrors the device algorithm step for step (erosion DT,
window max, marker CCL, simultaneous-BFS growth with raster-min tie-break)
and serves as the correctness oracle, per the repo kernel policy.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import scipy.ndimage as ndi

from lstm_unet_tpu.ops.postprocess import (
    chebyshev_distance,
    octagon_distance,
    postprocess_frame,
    split_touching_instances,
)

_INT_MAX = np.iinfo(np.int32).max


# ------------------------------------------------------------- NumPy twin


def _shifts(connectivity=8):
    s = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 8:
        s += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    return s


def _erode_np(m):
    p = np.pad(m, 1)
    out = m.copy()
    for dy, dx in _shifts():
        out &= p[1 + dy:1 + dy + m.shape[0], 1 + dx:1 + dx + m.shape[1]]
    return out


def _erode4_np(m):
    p = np.pad(m, 1)
    out = m.copy()
    for dy, dx in _shifts(4):
        out &= p[1 + dy:1 + dy + m.shape[0], 1 + dx:1 + dx + m.shape[1]]
    return out


def chebyshev_distance_np(mask):
    m = mask.astype(bool)
    d = m.astype(np.int32)
    while m.any():
        m = _erode_np(m)
        d += m
    return d


def octagon_distance_np(mask):
    m = mask.astype(bool)
    d = m.astype(np.int32)
    it = 0
    while m.any():
        m = _erode_np(m) if it % 2 == 0 else _erode4_np(m)
        d += m
        it += 1
    return d


def _window_max_np(d, window):
    out = d.copy()
    for _ in range(window):
        p = np.pad(out, 1)
        nxt = out.copy()
        for dy, dx in _shifts():
            nxt = np.maximum(
                nxt, p[1 + dy:1 + dy + d.shape[0], 1 + dx:1 + dx + d.shape[1]])
        out = nxt
    return out


def _ccl_np(mask):
    """8-connected CCL with component-min linear-index+1 ids (the device
    convention: ops/ccl.py seeds labels with raster indices)."""
    ref, n = ndi.label(mask, structure=np.ones((3, 3)))
    out = np.zeros(mask.shape, np.int32)
    idx = np.arange(mask.size).reshape(mask.shape)
    for lab in range(1, n + 1):
        sel = ref == lab
        out[sel] = idx[sel].min() + 1
    return out


def _grow_np(lbl, band):
    """Simultaneous BFS: each round, every unlabeled band pixel takes the
    MIN nonzero label over its 8-neighborhood (ties -> smaller label)."""
    cur = lbl.copy()
    while True:
        masked = np.where(cur > 0, cur, _INT_MAX)
        p = np.pad(masked, 1, constant_values=_INT_MAX)
        nb = np.full(cur.shape, _INT_MAX, np.int64)
        for dy, dx in _shifts():
            nb = np.minimum(
                nb, p[1 + dy:1 + dy + cur.shape[0], 1 + dx:1 + dx + cur.shape[1]])
        new = np.where((cur == 0) & band & (nb != _INT_MAX), nb, cur)
        if np.array_equal(new, cur):
            return cur.astype(np.int32)
        cur = new


def split_touching_instances_np(lbl, interior, window=16, min_dist=4, slack=1,
                                rel=0.65, rel_window=48, min_size=0):
    dist = octagon_distance_np(interior)
    wmax = _window_max_np(dist, window)
    markers = interior & (dist >= wmax - slack) & (dist >= min_dist)
    if rel > 0:
        wide = _window_max_np(dist, max(window, rel_window))
        markers &= dist.astype(np.float32) >= rel * wide.astype(np.float32)
    if min_size > 0:
        counts = np.bincount(lbl.reshape(-1), minlength=lbl.size + 1)
        markers &= counts[lbl] >= min_size
    seeds = _ccl_np(markers)
    grown = _grow_np(seeds, interior)
    return np.where(grown > 0, grown, np.where(lbl > 0, lbl, 0)).astype(np.int32)


def _ellipse_mask(h, w, cy, cx, ry, rx):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0


# ------------------------------------------------------------------ tests


def test_chebyshev_distance_matches_numpy_and_scipy(rng):
    mask = rng.random((40, 56)) > 0.55
    ours = np.asarray(chebyshev_distance(jnp.asarray(mask)))
    twin = chebyshev_distance_np(mask)
    np.testing.assert_array_equal(ours, twin)
    # scipy cross-check (chessboard cdt). scipy does NOT count the image
    # border as background while our op does (cells clipped by the frame
    # edge erode from the edge) — zero the border for an apples-to-apples
    # comparison of the interior behavior.
    mask[0, :] = mask[-1, :] = mask[:, 0] = mask[:, -1] = False
    ours_b = np.asarray(chebyshev_distance(jnp.asarray(mask)))
    ref = ndi.distance_transform_cdt(mask, metric="chessboard")
    np.testing.assert_array_equal(ours_b, ref)


def test_octagon_distance_twin_and_euclidean_proximity(rng):
    mask = ndi.gaussian_filter(rng.random((64, 64)), 4.0) > 0.5
    # zero the border: the op counts it as background, EDT does not
    mask[0, :] = mask[-1, :] = mask[:, 0] = mask[:, -1] = False
    ours = np.asarray(octagon_distance(jnp.asarray(mask)))
    np.testing.assert_array_equal(ours, octagon_distance_np(mask))
    # the octagon norm tracks Euclidean within ~8% (+1 discretization);
    # Chebyshev under-measures diagonals by up to 29%
    edt = ndi.distance_transform_edt(mask)
    assert np.all(ours <= np.ceil(edt) + 1)
    assert np.all(ours >= np.floor(edt * 0.92) - 1)


@pytest.mark.parametrize("window,min_dist,slack,rel,rel_window",
                         [(3, 2, 0, 0.0, 0), (8, 4, 1, 0.65, 24),
                          (16, 4, 2, 0.5, 20)])
def test_split_matches_numpy_twin(rng, window, min_dist, slack, rel,
                                  rel_window):
    """Device op == twin on random blobby masks (smoothed noise keeps the
    components blob-like rather than salt-and-pepper)."""
    for seed in range(3):
        r = np.random.default_rng(seed)
        field = ndi.gaussian_filter(r.random((64, 64)), 3.0)
        interior = field > np.percentile(field, 60)
        lbl = _ccl_np(interior)
        ours = np.asarray(split_touching_instances(
            jnp.asarray(lbl), jnp.asarray(interior),
            window=window, min_dist=min_dist, slack=slack, rel=rel,
            rel_window=rel_window))
        twin = split_touching_instances_np(lbl, interior, window, min_dist,
                                           slack, rel, rel_window)
        np.testing.assert_array_equal(ours, twin)


def test_rel_rule_suppresses_minor_lobe():
    """A dumbbell of one BIG and one SMALL lobe (occlusion-crescent shape):
    with the relative rule the small lobe's marker is suppressed (one
    instance, graceful no-split); with rel=0 it oversplits into two. Two
    COMPARABLE lobes still split under the same rel."""
    h, w = 64, 96
    big = _ellipse_mask(h, w, 32, 30, 20, 20)
    small = _ellipse_mask(h, w, 32, 56, 7, 7)
    interior = big | small
    lbl = _ccl_np(interior)
    assert ndi.label(interior, structure=np.ones((3, 3)))[1] == 1
    out_rel = np.asarray(split_touching_instances(
        jnp.asarray(lbl), jnp.asarray(interior), window=8, min_dist=3,
        slack=1, rel=0.65, rel_window=48))
    assert len(np.unique(out_rel[interior])) == 1
    out_norel = np.asarray(split_touching_instances(
        jnp.asarray(lbl), jnp.asarray(interior), window=8, min_dist=3,
        slack=1, rel=0.0))
    assert len(np.unique(out_norel[interior])) == 2
    # comparable lobes: both peaks pass the relative bar
    b2 = _ellipse_mask(h, w, 32, 62, 18, 18)
    interior2 = big | b2
    lbl2 = _ccl_np(interior2)
    out2 = np.asarray(split_touching_instances(
        jnp.asarray(lbl2), jnp.asarray(interior2), window=8, min_dist=3,
        slack=1, rel=0.65, rel_window=48))
    assert len(np.unique(out2[interior2])) == 2


def test_two_touching_cells_split():
    """Two overlapping discs merge into ONE CCL component; the splitter
    separates them along the equidistant ridge, each GT disc keeping a
    distinct majority label."""
    h = w = 64
    a = _ellipse_mask(h, w, 32, 20, 12, 12)
    b = _ellipse_mask(h, w, 32, 42, 12, 12)
    interior = a | b
    lbl = _ccl_np(interior)
    assert lbl.max() == lbl[interior].min()  # really one merged component
    out = np.asarray(split_touching_instances(
        jnp.asarray(lbl), jnp.asarray(interior), window=8, min_dist=4))
    ids = np.unique(out[interior])
    assert len(ids) == 2, ids
    # centers land in different regions
    assert out[32, 20] != out[32, 42]
    # support unchanged: splitting relabels, never adds/removes pixels
    np.testing.assert_array_equal(out > 0, interior)


def test_single_cell_not_split():
    h = w = 48
    interior = _ellipse_mask(h, w, 24, 24, 14, 9)
    lbl = _ccl_np(interior)
    out = np.asarray(split_touching_instances(
        jnp.asarray(lbl), jnp.asarray(interior), window=8, min_dist=4))
    assert len(np.unique(out[interior])) == 1
    np.testing.assert_array_equal(out > 0, interior)


def test_markerless_component_keeps_original_label():
    """A thin component whose every pixel is < min_dist from background
    gets no marker and must keep its ORIGINAL label (not vanish, not be
    absorbed by another component's marker)."""
    interior = np.zeros((32, 32), bool)
    interior[4:24, 4:6] = True       # 2-px-wide bar: max distance 1
    interior[10:20, 15:28] = True    # fat blob: gets a marker
    lbl = _ccl_np(interior)
    bar_id = lbl[4, 4]
    out = np.asarray(split_touching_instances(
        jnp.asarray(lbl), jnp.asarray(interior), window=4, min_dist=4,
        slack=1))
    assert np.all(out[4:24, 4:6] == bar_id)
    assert len(np.unique(out[interior])) == 2
    twin = split_touching_instances_np(lbl, interior, 4, 4, 1)
    np.testing.assert_array_equal(out, twin)


def test_min_size_gates_split_eligibility():
    """split min_size: a small two-lobed component below the threshold is
    left untouched (keeps ONE original label, bit-identical), while a large
    merged pair above it still splits. Twin agrees."""
    h, w = 96, 160
    small = _ellipse_mask(h, w, 20, 20, 9, 9) | _ellipse_mask(h, w, 20, 36, 9, 9)
    big = _ellipse_mask(h, w, 64, 60, 20, 20) | _ellipse_mask(h, w, 64, 96, 20, 20)
    interior = small | big
    lbl = _ccl_np(interior)
    thresh = int(small.sum()) + 1
    out = np.asarray(split_touching_instances(
        jnp.asarray(lbl), jnp.asarray(interior), window=8, min_dist=3,
        slack=1, rel=0.65, rel_window=48, min_size=thresh))
    assert len(np.unique(out[small])) == 1      # ineligible: untouched
    np.testing.assert_array_equal(out[small], lbl[small])
    assert len(np.unique(out[big])) == 2        # eligible: split
    twin = split_touching_instances_np(lbl, interior, 8, 3, 1, 0.65, 48,
                                       thresh)
    np.testing.assert_array_equal(out, twin)


def test_postprocess_frame_instance_split_end_to_end():
    """Touching cells with NO predicted boundary between them: default
    postprocess merges them (1 instance); instance_split recovers 2."""
    h = w = 64
    a = _ellipse_mask(h, w, 32, 20, 11, 11)
    b = _ellipse_mask(h, w, 32, 42, 11, 11)
    interior = (a | b).astype(np.float32)
    probs = np.stack([1.0 - interior, interior, np.zeros_like(interior)], -1)
    merged = np.asarray(postprocess_frame(jnp.asarray(probs), min_cell_size=5))
    assert merged.max() == 1
    split = np.asarray(postprocess_frame(jnp.asarray(probs), min_cell_size=5,
                                         instance_split=True))
    assert split.max() == 2
    assert split[32, 20] != split[32, 42]
    # ids compact 1..N in raster order; support unchanged
    np.testing.assert_array_equal(split > 0, interior.astype(bool))


# ------------------------------------------- probability-guided (hysteresis)

def split_touching_instances_prob_np(lbl, interior, p_cell, hi=0.8, erode=1,
                                     min_size=0):
    """NumPy twin of ops/postprocess.py::split_touching_instances_prob."""
    markers = interior & (p_cell >= hi)
    for _ in range(erode):
        markers = _erode_np(markers)
    if min_size > 0:
        counts = np.bincount(lbl.reshape(-1), minlength=lbl.size + 1)
        markers &= counts[lbl] >= min_size
    seeds = _ccl_np(markers)
    grown = _grow_np(seeds, interior)
    return np.where(grown > 0, grown, np.where(lbl > 0, lbl, 0)).astype(np.int32)


def _two_bump_pcell(h=64, w=64, cy=32, cx1=22, cx2=42, sigma=9.0, peak=0.95):
    """Two gaussian confidence bumps whose midpoint dips below a high
    threshold but stays above cell_thresh — the signature of a merge where
    the boundary class faded but the model still hesitated."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    g1 = peak * np.exp(-(((yy - cy) ** 2 + (xx - cx1) ** 2) / (2 * sigma**2)))
    g2 = peak * np.exp(-(((yy - cy) ** 2 + (xx - cx2) ** 2) / (2 * sigma**2)))
    return np.maximum(g1, g2).astype(np.float32)


@pytest.mark.parametrize("hi,erode,min_size",
                         [(0.8, 1, 0), (0.7, 0, 0), (0.85, 2, 0),
                          (0.8, 1, 200)])
def test_prob_split_matches_numpy_twin(hi, erode, min_size):
    from lstm_unet_tpu.ops.postprocess import split_touching_instances_prob

    rng = np.random.default_rng(5)
    h = w = 96
    p_cell = np.zeros((h, w), np.float32)
    for _ in range(6):
        cy, cx = rng.uniform(12, h - 12), rng.uniform(12, w - 12)
        sig = rng.uniform(4, 9)
        pk = rng.uniform(0.6, 1.0)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        g = pk * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)))
        p_cell = np.maximum(p_cell, g.astype(np.float32))
    interior = p_cell > 0.5
    lbl = _ccl_np(interior)
    twin = split_touching_instances_prob_np(lbl, interior, p_cell, hi=hi,
                                            erode=erode, min_size=min_size)
    out = np.asarray(split_touching_instances_prob(
        jnp.asarray(lbl), jnp.asarray(interior), jnp.asarray(p_cell),
        hi_thresh=hi, erode_iters=erode, min_size=min_size))
    np.testing.assert_array_equal(out, twin)


def test_prob_split_fires_on_confidence_dip():
    """Merged blob with an internal p(cell) dip (below hi, above
    cell_thresh): 'prob' recovers 2 instances along the dip."""
    p_cell = _two_bump_pcell()
    interior = p_cell > 0.5
    assert _ccl_np(interior).max() > 0
    # one merged component, midpoint inside the interior but under hi
    assert interior[32, 32] and p_cell[32, 32] < 0.8
    probs = np.stack([1 - p_cell, p_cell, np.zeros_like(p_cell)], -1)
    merged = np.asarray(postprocess_frame(jnp.asarray(probs), min_cell_size=5))
    assert merged.max() == 1
    split = np.asarray(postprocess_frame(
        jnp.asarray(probs), min_cell_size=5, instance_split=True,
        split_method="prob", split_hi_thresh=0.8, split_erode=1))
    assert split.max() == 2
    assert split[32, 22] != split[32, 42]
    np.testing.assert_array_equal(split > 0, interior)


def test_prob_split_confident_blob_untouched():
    """Uniform high confidence (no internal dip): one marker component —
    the blob is reproduced exactly, NOT split."""
    h = w = 64
    m = _ellipse_mask(h, w, 32, 32, 14, 20)
    p_cell = np.where(m, 0.97, 0.0).astype(np.float32)
    probs = np.stack([1 - p_cell, p_cell, np.zeros_like(p_cell)], -1)
    base = np.asarray(postprocess_frame(jnp.asarray(probs), min_cell_size=5))
    split = np.asarray(postprocess_frame(
        jnp.asarray(probs), min_cell_size=5, instance_split=True,
        split_method="prob"))
    np.testing.assert_array_equal(base, split)


def test_prob_split_no_marker_keeps_original_label():
    """p(cell) never reaches hi: no marker — original labels bit-identical
    (graceful per-component fallback)."""
    p_cell = 0.65 * _ellipse_mask(64, 64, 32, 32, 10, 10).astype(np.float32)
    probs = np.stack([1 - p_cell, p_cell, np.zeros_like(p_cell)], -1)
    base = np.asarray(postprocess_frame(jnp.asarray(probs), min_cell_size=5))
    split = np.asarray(postprocess_frame(
        jnp.asarray(probs), min_cell_size=5, instance_split=True,
        split_method="prob", split_hi_thresh=0.8))
    assert base.max() == 1
    np.testing.assert_array_equal(base, split)


def test_prob_split_min_size_gates_eligibility():
    """A small two-bump pair under split_min_size keeps ONE label while a
    big eligible pair splits (same economics as the dist splitter)."""
    p_cell = _two_bump_pcell()
    interior = p_cell > 0.5
    size = int(interior.sum())
    probs = np.stack([1 - p_cell, p_cell, np.zeros_like(p_cell)], -1)
    gated = np.asarray(postprocess_frame(
        jnp.asarray(probs), min_cell_size=5, instance_split=True,
        split_method="prob", split_min_size=size + 1))
    assert gated.max() == 1
    ungated = np.asarray(postprocess_frame(
        jnp.asarray(probs), min_cell_size=5, instance_split=True,
        split_method="prob", split_min_size=size))
    assert ungated.max() == 2
