"""Fused per-crop visual feature extraction — one jitted pass over a crop
batch replacing ~10 separate per-image OpenCV passes in the reference
(_detect_chart_subtype/_detect_grid/_count_arrows/_estimate_data_points/
_extract_dominant_colors/..., ref pdf_image_segmentation.py:1320-1617).

Input: (B, H, W, 3) uint8 RGB crop batch (padded to fixed shape, pad = white).
Output: dict of per-crop numeric features (device arrays) + CC label maps.
Decision logic (keyword regexes, threshold comparisons) stays host-side in
synapta_tpu/vision/classify.py — strings never touch the device.

Geometry note: crops are rendered so max(H, W) <= canvas (512); the
reference's adaptive kernel max(20, dim//20) lands in [20, 25] for that
range, so a fixed k=20 kernel is used (locked by decision-parity tests).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from synapta_tpu.ops.cc import connected_components
from synapta_tpu.ops.color import rgb_to_gray
from synapta_tpu.ops.filters import (
    binarize_ink,
    box_count,
    diagonal_run_mask,
    dilate,
    erode,
    morph_open,
    sobel_edges,
)
from synapta_tpu.ops.kmeans import dominant_colors


def _open_iter2(img: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2 MORPH_OPEN with iterations=2 == erode twice then dilate twice,
    equivalent to one open with the (2k-1)-sized kernel."""
    ekh = 2 * kh - 1 if kh > 1 else 1
    ekw = 2 * kw - 1 if kw > 1 else 1
    return dilate(erode(img, ekh, ekw), ekh, ekw)


def _run_length_rows(mask: jnp.ndarray, min_len: int) -> jnp.ndarray:
    """Per-image count of pixels that belong to a horizontal run >= min_len."""
    runs = erode(mask, 1, min_len)  # survives only if min_len-window all set
    return box_count(runs > 0)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def _cc_jit(mask, connectivity=8):
    return connected_components(mask, connectivity=connectivity)


def extract_crop_features(
    rgb: jnp.ndarray,
    line_kernel: int = 20,
    grid_kernel: int = 25,
) -> Dict[str, jnp.ndarray]:
    """The feature pass over a crop batch. rgb: (B, H, W, 3) uint8.

    Composed of a few separately-jitted stages so the (expensive-to-compile)
    connected-components executable compiles once and serves all four label
    maps; XLA still fuses everything within each stage."""
    out = dict(_core_features(rgb, line_kernel, grid_kernel))
    out["labels_ink"] = _cc_jit(out.pop("_ink"))
    out["labels_vopen"] = _cc_jit(out.pop("_vdet"))
    out["labels_vink"] = _cc_jit(out.pop("_vink"))
    out["labels_bg"] = _cc_jit(out.pop("_bg"), connectivity=4)
    return out


@functools.partial(jax.jit, static_argnames=("line_kernel", "grid_kernel"))
def _core_features(
    rgb: jnp.ndarray,
    line_kernel: int = 20,
    grid_kernel: int = 25,
) -> Dict[str, jnp.ndarray]:
    """Fused non-CC features. rgb: (B, H, W, 3) uint8."""
    B, H, W, _ = rgb.shape
    gray = rgb_to_gray(rgb)                       # (B, H, W) 0..255
    edges, mag, theta = sobel_edges(gray)
    e = edges.astype(jnp.float32)

    # chart structure signals (ref :1366-1409)
    v_detect = _open_iter2(e, line_kernel, 1)
    h_detect = _open_iter2(e, 1, line_kernel)
    v_pixels = box_count(v_detect > 0)
    h_pixels = box_count(h_detect > 0)

    # long horizontal lines for the line-chart bonus (ref :1387-1393):
    # pixels on h-runs of >= W/5 (between the ref's W/4 min length and
    # 0.2*W span test)
    long_h_pixels = _run_length_rows(e, max(8, W // 5))

    # grid (ref :1546-1564)
    grid_h = box_count(_open_iter2(e, 1, grid_kernel) > 0)
    grid_v = box_count(_open_iter2(e, grid_kernel, 1) > 0)

    # diagonal structure for arrows (ref :1320-1341): pixels on >=24px
    # diagonal runs, both diagonals
    diag1 = diagonal_run_mask(edges, 24, anti=False)
    diag2 = diagonal_run_mask(edges, 24, anti=True)
    diag_pixels = box_count(diag1 | diag2)

    # overall line pixels for connection counting (ref :1695-1711)
    line_pixels = box_count((v_detect > 0) | (h_detect > 0)) + diag_pixels

    # circle / pie scoring (ref :1411-1448): radial histogram of edge
    # pixels around the ink centroid; a dominant ring at large radius with
    # interior edge density marks a pie.
    ink = binarize_ink(gray)
    ys = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
    ink_n = jnp.maximum(box_count(ink), 1.0)
    cy = jnp.sum(ys * ink, axis=(1, 2)) / ink_n
    cx = jnp.sum(xs * ink, axis=(1, 2)) / ink_n
    r = jnp.sqrt((ys - cy[:, None, None]) ** 2 + (xs - cx[:, None, None]) ** 2)
    NBINS = 48
    rmax = 0.5 * min(H, W)
    rbin = jnp.clip((r / rmax * NBINS).astype(jnp.int32), 0, NBINS - 1)
    seg_ids = (
        rbin + jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 0) * NBINS
    ).reshape(-1)
    hist = jax.ops.segment_sum(
        e.reshape(-1), seg_ids, num_segments=B * NBINS
    ).reshape(B, NBINS)
    # normalize each bin by its circumference ~ r
    bin_r = (jnp.arange(NBINS, dtype=jnp.float32) + 0.5) * (rmax / NBINS)
    density = hist / (2 * jnp.pi * bin_r + 1e-6)[None, :]
    # ring = peak density bin in the "large radius" band [0.4, 0.95]*rmax
    lo, hi = int(NBINS * 0.4), int(NBINS * 0.95)
    band = density[:, lo:hi]
    ring_peak = jnp.max(band, axis=1)
    ring_bin = jnp.argmax(band, axis=1) + lo
    ring_radius = (ring_bin.astype(jnp.float32) + 0.5) * (rmax / NBINS)
    # mean edge coverage elsewhere in the band (ring must dominate)
    band_mean = jnp.mean(band, axis=1)
    ring_score = ring_peak / (band_mean + 1e-6)
    # edge density inside the ring circle (pie slice boundaries, ref :1439)
    inside = (r <= ring_radius[:, None, None]).astype(jnp.float32)
    inside_edges = jnp.sum(e * inside, axis=(1, 2))
    circle_edge_density = inside_edges / (
        jnp.pi * ring_radius * ring_radius + 1e-6
    )

    # stats
    variance = jnp.var(gray, axis=(1, 2))
    edge_count = box_count(edges)

    # masks handed to the shared CC executable by the composing wrapper:
    # filled-bar signal = vertically-opened INK (filled bars survive a tall
    # erosion; glyphs and thin horizontals do not); enclosed background
    # regions (4-conn complement) = interiors of outlined shapes — the
    # contour-hierarchy analog of cv2 RETR_TREE
    v_ink = morph_open(ink, 2 * line_kernel - 1, 1)
    v_ink_pixels = box_count(v_ink > 0)

    centers, ccounts, n_masked = dominant_colors(rgb)

    return {
        "v_pixels": v_pixels,
        "h_pixels": h_pixels,
        "long_h_pixels": long_h_pixels,
        "grid_h": grid_h,
        "grid_v": grid_v,
        "diag_pixels": diag_pixels,
        "line_pixels": line_pixels,
        "ring_score": ring_score,
        "ring_radius": ring_radius,
        "circle_edge_density": circle_edge_density,
        "variance": variance,
        "edge_count": edge_count,
        "ink_count": box_count(ink),
        "_ink": ink,
        "_vdet": (v_detect > 0).astype(jnp.float32),
        "_vink": (v_ink > 0).astype(jnp.float32),
        "_bg": 1.0 - ink,
        "v_ink_pixels": v_ink_pixels,
        "kmeans_centers": centers,
        "kmeans_counts": ccounts,
        "kmeans_masked": n_masked,
    }
