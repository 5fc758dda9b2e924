"""Connected components on TPU via segmented max-scans.

Replaces cv2.findContours / SimpleBlobDetector call sites
(ref pdf_image_segmentation.py:1401-1409, 1596-1617, 1758-1775) with a
data-parallel labeling: every masked pixel starts with a unique id and
labels propagate to the component maximum through alternating row/column
segmented cumulative-max scans plus an 8-neighbor max step, inside a
bounded while_loop. Fully batched and jit-compatible: (B, H, W) masks in,
(B, H, W) int32 label maps out.

Per-component scalar stats (area, bbox) are computed with one host-side
vectorized pass over the label map — label maps leave HBM once per crop
batch, the pixel-heavy work stays on device.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _seg_max_scan(values: jnp.ndarray, mask: jnp.ndarray, axis: int,
                  reverse: bool) -> jnp.ndarray:
    """Segmented running max along ``axis``: the max resets wherever
    mask == 0. values/mask: (..., N) along axis."""
    flags = 1.0 - mask  # 1 = segment boundary (non-ink)

    def combine(a, b):
        va, fa = a
        vb, fb = b
        v = jnp.where(fb > 0, vb, jnp.maximum(va, vb))
        f = jnp.maximum(fa, fb)
        return v, f

    v, _ = lax.associative_scan(
        combine, (values, flags), axis=axis, reverse=reverse
    )
    return v * mask


def connected_components(mask: jnp.ndarray, max_iters: int = 64,
                         connectivity: int = 8) -> jnp.ndarray:
    """8- (or 4-) connected labeling of a (B, H, W) {0,1} mask.

    Returns int32 labels (0 = background); labels are arbitrary unique ints
    (the max initial id in each component). Use connectivity=4 when labeling
    background/hole regions (the standard complement convention, so thin
    diagonal ink boundaries don't leak).
    """
    B, H, W = mask.shape
    m = mask.astype(jnp.float32)
    init = (
        jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1) * W
        + jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
        + 1
    ).astype(jnp.float32) * m

    def neighbor_max(lbl):
        # 8-neighborhood max == separable 3x3 window max (row pass then
        # column pass, 2 reduce_windows instead of 8 shifted maxima);
        # including the center pixel is harmless (labels only grow)
        from synapta_tpu.ops.filters import dilate

        return dilate(lbl, 3, 3) * m

    def step(lbl):
        # For 4-connectivity the alternating row/column segmented scans
        # already realize every connected path; the neighbor hop is only
        # needed to carry labels across diagonal adjacencies (8-conn).
        # (A label[label] pointer-jump per round was tried to halve
        # convergence on snaking components: the (B, H*W) gather measured
        # ~2x SLOWER than the scans it saved on this TPU — reverted.)
        if connectivity == 8:
            lbl = neighbor_max(lbl)
        lbl = _seg_max_scan(lbl, m, axis=2, reverse=False)
        lbl = _seg_max_scan(lbl, m, axis=2, reverse=True)
        lbl = _seg_max_scan(lbl, m, axis=1, reverse=False)
        lbl = _seg_max_scan(lbl, m, axis=1, reverse=True)
        return lbl

    def cond(state):
        i, lbl, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, lbl, _ = state
        new = step(lbl)
        return i + 1, new, jnp.any(new != lbl)

    _, labels, _ = lax.while_loop(cond, body, (0, step(init), jnp.array(True)))
    return labels.astype(jnp.int32)


def component_stats(labels: np.ndarray, min_area: int = 1) -> List[Dict]:
    """Host-side per-component stats from ONE label map (H, W).

    Returns [{label, area, bbox(x0,y0,x1,y1 inclusive-exclusive), w, h}],
    sorted by area descending.
    """
    lab = np.asarray(labels)
    flat = lab.ravel()
    nz = flat[flat > 0]
    if nz.size == 0:
        return []
    uniq, inv_idx, counts = np.unique(nz, return_inverse=True, return_counts=True)
    ys, xs = np.nonzero(lab)
    # inv maps each nonzero pixel -> component index
    x0 = np.full(len(uniq), np.inf)
    x1 = np.full(len(uniq), -np.inf)
    y0 = np.full(len(uniq), np.inf)
    y1 = np.full(len(uniq), -np.inf)
    np.minimum.at(x0, inv_idx, xs)
    np.maximum.at(x1, inv_idx, xs)
    np.minimum.at(y0, inv_idx, ys)
    np.maximum.at(y1, inv_idx, ys)
    out = []
    for i in np.argsort(-counts):
        if counts[i] < min_area:
            continue
        out.append(
            {
                "label": int(uniq[i]),
                "area": int(counts[i]),
                "bbox": (int(x0[i]), int(y0[i]), int(x1[i]) + 1, int(y1[i]) + 1),
                "w": int(x1[i] - x0[i] + 1),
                "h": int(y1[i] - y0[i] + 1),
            }
        )
    return out


# ---------------------------------------------------------------------------
# device-side component statistics (no label-map transfers)
# ---------------------------------------------------------------------------


def component_stats_device(labels: jnp.ndarray, k: int = 128):
    """Per-component stats computed ON DEVICE from a (B, H, W) label map.

    Returns a dict of (B, k) arrays — x0, y0, x1, y1 (inclusive), area —
    for the k largest components, plus full (B, H*W) per-position arrays
    for census reductions (stats sit at each component's sorted run-end
    position; area is 0 everywhere else, which censuses mask on). Only
    the compact top-k arrays should leave the device: label maps are
    never transferred (the tunnel to the TPU makes bulk D2H
    prohibitively slow, and a host round-trip per crop is exactly what
    the north star forbids).
    """
    B, H, W = labels.shape
    flat = labels.reshape(B, -1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2).reshape(B, -1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1).reshape(B, -1)

    # SORT-based segmented reduction — no scatter. XLA lowers segment_sum/
    # segment_max at N=H*W+1 bins to a scatter that serializes its update
    # stream on TPU; it measured as the single most expensive part of the
    # analyze pass (~13ms per call per 16-crop chunk, three calls per
    # batch). A key-value sort groups each component contiguously, one
    # segmented associative scan accumulates (count, bbox) within runs,
    # and the run-END positions then hold complete per-component stats —
    # every step a dense vector op the TPU executes at full bandwidth
    # (sort+scan measured at the D2H-floor, i.e. ~free).
    ids_s, xs_s, ys_s = jax.lax.sort((flat, xs, ys), dimension=-1,
                                     num_keys=1)
    xf = xs_s.astype(jnp.float32)
    yf = ys_s.astype(jnp.float32)
    start = jnp.concatenate(
        [jnp.ones((B, 1), bool), ids_s[:, 1:] != ids_s[:, :-1]], axis=1
    ).astype(jnp.float32)

    def comb(a, b):
        acnt, ax0, ay0, ax1, ay1, af = a
        bcnt, bx0, by0, bx1, by1, bf = b
        new = bf > 0  # b starts a fresh segment: discard a's running stats
        return (
            jnp.where(new, bcnt, acnt + bcnt),
            jnp.where(new, bx0, jnp.minimum(ax0, bx0)),
            jnp.where(new, by0, jnp.minimum(ay0, by0)),
            jnp.where(new, bx1, jnp.maximum(ax1, bx1)),
            jnp.where(new, by1, jnp.maximum(ay1, by1)),
            jnp.maximum(af, bf),
        )

    cnt, x0, y0, x1, y1, _ = jax.lax.associative_scan(
        comb, (jnp.ones_like(xf), xf, yf, xf, yf, start), axis=1
    )
    end = jnp.concatenate(
        [ids_s[:, 1:] != ids_s[:, :-1], jnp.ones((B, 1), bool)], axis=1
    )
    # only run ends of nonzero labels carry component stats; everything
    # else gets area 0, which census_counts and top_k both mask on
    area = jnp.where(end & (ids_s > 0), cnt, 0.0)
    top_area, top_idx = jax.lax.top_k(area, k)
    take = jax.vmap(jnp.take)
    return {
        "area": top_area,
        "x0": take(x0, top_idx),
        "y0": take(y0, top_idx),
        "x1": take(x1, top_idx),
        "y1": take(y1, top_idx),
        "_full_area": area,
        "_full_x0": x0,
        "_full_x1": x1,
        "_full_y0": y0,
        "_full_y1": y1,
    }


def census_counts(stats, pred):
    """Count components (per image) satisfying ``pred(area, w, h, x0, y0,
    x1, y1)`` over the FULL per-bin stats — stays on device."""
    area = stats["_full_area"]
    w = (stats["_full_x1"] - stats["_full_x0"] + 1).astype(jnp.float32)
    h = (stats["_full_y1"] - stats["_full_y0"] + 1).astype(jnp.float32)
    mask = (area > 0) & pred(
        area, w, h,
        stats["_full_x0"], stats["_full_y0"],
        stats["_full_x1"], stats["_full_y1"],
    )
    return jnp.sum(mask.astype(jnp.float32), axis=1)
