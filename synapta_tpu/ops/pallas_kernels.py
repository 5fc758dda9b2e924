"""Pallas TPU kernels for the hot image-statistics path.

``fused_edge_stats`` computes, in ONE pass over HBM per crop (the XLA path
re-reads the gray image for each of ~6 reduce_window pipelines): Sobel
edge map, directional morphological opens (line/bar/grid signals), and
their pixel counts. The whole 512x512 f32 crop tile fits in VMEM (~1 MB),
so every intermediate lives on-chip; only (B, 5) count scalars return to
HBM.

Morphology note: erosion over a k-window decomposes into ceil(log2(k))
min-reductions by doubling (e_{2n} = min(e_n, shift(e_n, n))) — O(log k)
VPU ops instead of k-1. Borders replicate (equivalent to SAME-padded
reduce_window with the edge clamped), matching ops/filters.py on the
interior; counts differ only in a <=k-wide border band, below the decision
thresholds' noise floor (locked by the parity test).

Falls back to interpret mode off-TPU so tests run anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift2(a, dy: int, dx: int):
    """Edge-replicating shift of a 2D block. Static offsets in {-1, 0, 1};
    built from concatenate + static slices (Mosaic lowers neither
    dynamic_slice nor mode="edge" pads)."""
    if dy == 1:
        a = jnp.concatenate([a[:1], a[:-1]], axis=0)
    elif dy == -1:
        a = jnp.concatenate([a[1:], a[-1:]], axis=0)
    if dx == 1:
        a = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    elif dx == -1:
        a = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    return a


def _shift_axis(a, delta: int, axis: int, fill: float):
    """Shift by +-delta along axis, filling vacated lanes with ``fill``
    (static slicing only)."""
    if delta == 0:
        return a
    H, W = a.shape
    n = abs(delta)
    if axis == 0:
        filler = jnp.full((n, W), fill, a.dtype)
        if delta > 0:
            return jnp.concatenate([filler, a[: H - n]], axis=0)
        return jnp.concatenate([a[n:], filler], axis=0)
    filler = jnp.full((H, n), fill, a.dtype)
    if delta > 0:
        return jnp.concatenate([filler, a[:, : W - n]], axis=1)
    return jnp.concatenate([a[:, n:], filler], axis=1)


_BIG = 1e30


def _erode1d(a, k: int, axis: int):
    """Running min over a k-window via O(log k) doubling; the final
    centering shift fills with 0 (border band counts as eroded)."""
    out = a
    n = 1
    while n < k:
        step = min(n, k - n)
        out = jnp.minimum(out, _shift_axis(out, -step, axis, _BIG))
        n += step
    # center the window: reduce computed [i, i+k) — shift back by k//2
    out = _shift_axis(out, k // 2, axis, 0.0)
    return jnp.where(out >= _BIG, 0.0, out)


def _dilate1d(a, k: int, axis: int):
    out = a
    n = 1
    while n < k:
        step = min(n, k - n)
        out = jnp.maximum(out, _shift_axis(out, -step, axis, 0.0))
        n += step
    return _shift_axis(out, k // 2, axis, 0.0)


def _open1d(a, k: int, axis: int):
    return _dilate1d(_erode1d(a, k, axis), k, axis)


def _edge_stats_kernel(gray_ref, out_ref, *, line_k: int, grid_k: int,
                       high: float):
    g = gray_ref[0]  # (H, W) block
    # Sobel via 8 shifted adds
    tl = _shift2(g, -1, -1)
    t = _shift2(g, -1, 0)
    tr = _shift2(g, -1, 1)
    l = _shift2(g, 0, -1)
    r = _shift2(g, 0, 1)
    bl = _shift2(g, 1, -1)
    b = _shift2(g, 1, 0)
    br = _shift2(g, 1, 1)
    gx = (tr + 2 * r + br) - (tl + 2 * l + bl)
    gy = (bl + 2 * b + br) - (tl + 2 * t + tr)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # non-max suppression + double threshold, matching ops/filters.py.
    # Sector tests use |gy|/|gx| ratios and the gradient sign product —
    # Mosaic has no atan2, and none is needed for 4-sector quantization.
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    is_h = ay < 0.41421356 * ax          # within 22.5 deg of horizontal
    is_v = ay > 2.41421356 * ax          # within 22.5 deg of vertical
    is_d1 = (~is_h) & (~is_v) & (gx * gy >= 0.0)
    n1 = jnp.where(
        is_h, _shift2(mag, 0, 1),
        jnp.where(is_d1, _shift2(mag, 1, 1),
                  jnp.where(is_v, _shift2(mag, 1, 0), _shift2(mag, 1, -1))),
    )
    n2 = jnp.where(
        is_h, _shift2(mag, 0, -1),
        jnp.where(is_d1, _shift2(mag, -1, -1),
                  jnp.where(is_v, _shift2(mag, -1, 0), _shift2(mag, -1, 1))),
    )
    local_max = (mag >= n1) & (mag >= n2)
    strong = local_max & (mag >= high)
    weak = local_max & (mag >= high / 3.0)
    grown = strong
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                grown = grown | (_shift2(strong.astype(jnp.float32), dy, dx) > 0)
    edges = (strong | (weak & grown)).astype(jnp.float32)

    ekl = 2 * line_k - 1  # iterations=2 equivalence, cf. ops/features.py
    v_open = _open1d(edges, ekl, axis=0)
    h_open = _open1d(edges, ekl, axis=1)
    ekg = 2 * grid_k - 1
    gh = _open1d(edges, ekg, axis=1)
    gv = _open1d(edges, ekg, axis=0)

    counts = [
        jnp.sum(edges),
        jnp.sum((v_open > 0).astype(jnp.float32)),
        jnp.sum((h_open > 0).astype(jnp.float32)),
        jnp.sum((gh > 0).astype(jnp.float32)),
        jnp.sum((gv > 0).astype(jnp.float32)),
    ]
    # output tile is (8, 128) — the minimum f32 TPU tile; the 5 counts live
    # in row 0, placed with iota masks (Mosaic has no scatter)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    tile = jnp.zeros((8, 128), jnp.float32)
    for idx, c in enumerate(counts):
        tile = tile + jnp.where((row == 0) & (lane == idx), c, 0.0)
    out_ref[0] = tile


@functools.partial(
    jax.jit, static_argnames=("line_k", "grid_k", "high", "interpret")
)
def fused_edge_stats(
    gray: jnp.ndarray,
    line_k: int = 20,
    grid_k: int = 25,
    high: float = 150.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, H, W) gray f32 -> (B, 5) [edge_count, v_open, h_open, grid_h,
    grid_v] in one VMEM-resident pass per crop."""
    B, H, W = gray.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _edge_stats_kernel, line_k=line_k, grid_k=grid_k, high=high
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * 60,
            bytes_accessed=B * H * W * 4 + B * 32,
            transcendentals=B * H * W,
        ),
    )(gray)[:, 0, :5]
