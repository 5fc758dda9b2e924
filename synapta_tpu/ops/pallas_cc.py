"""Connected-components label propagation as a Pallas TPU kernel.

The XLA path (ops/cc.py) expresses one propagation iteration as an
8-neighbor max plus four ``lax.associative_scan`` segmented scans — each
scan materializes log-depth intermediates through HBM, and the
while_loop re-reads the full label map every iteration. This kernel runs
the ENTIRE fixed-iteration propagation with the label map resident in
VMEM: one HBM read of the mask, one HBM write of the labels, everything
between on the VPU.

Semantics match ops.cc.connected_components exactly (same unique-id
init, labels converge to the component max), verified by the parity test
in tests/test_pallas.py. Directional segmented max-scans are computed by
pointer-doubling: value v and in-segment gate g over distance d fold as

    v_{2d}[x] = max(v_d[x], g_d[x] * v_d[x - d])
    g_{2d}[x] = g_d[x] * g_d[x - d]

which realizes the full scan in log2(N) shifted elementwise steps —
shift + multiply + max are all native VPU ops on VMEM-resident tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(v, d: int, axis: int, reverse: bool, idx):
    """Distance-d predecessor (or successor when reverse) with zero fill.

    ``idx`` is the broadcasted iota along ``axis`` (precomputed once).
    pltpu.roll is circular; the iota mask zeroes the wrapped lanes.
    """
    n = v.shape[axis]
    if reverse:
        # pltpu.roll requires non-negative shifts: roll by n - d
        rolled = pltpu.roll(v, n - d, axis)
        return jnp.where(idx < n - d, rolled, 0.0)
    rolled = pltpu.roll(v, d, axis)
    return jnp.where(idx >= d, rolled, 0.0)


def _seg_scan(v, m, axis: int, reverse: bool, idx, log2n: int):
    """Segmented running max along one direction by pointer doubling."""
    g = _shift(m, 1, axis, reverse, idx) * m
    d = 1
    for _ in range(log2n):
        v = jnp.maximum(v, g * _shift(v, d, axis, reverse, idx))
        g = g * _shift(g, d, axis, reverse, idx)
        d *= 2
    return v * m


def _cc_kernel(mask_ref, out_ref, *, iters: int, connectivity: int):
    m = mask_ref[0].astype(jnp.float32)
    H, W = m.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lbl = (row * W + col + 1).astype(jnp.float32) * m
    log2w = max(1, (W - 1).bit_length())
    log2h = max(1, (H - 1).bit_length())

    if connectivity == 8:
        offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1),
                (1, 0), (1, 1)]
    else:
        offs = [(-1, 0), (0, -1), (0, 1), (1, 0)]

    def neighbor_max(v):
        best = v
        for dy, dx in offs:
            s = v
            if dy:
                s = _shift(s, abs(dy), 0, dy < 0, row)
            if dx:
                s = _shift(s, abs(dx), 1, dx < 0, col)
            best = jnp.maximum(best, s)
        return best * m

    def step(v):
        if connectivity == 8:
            v = neighbor_max(v)
        v = _seg_scan(v, m, 1, False, col, log2w)
        v = _seg_scan(v, m, 1, True, col, log2w)
        v = _seg_scan(v, m, 0, False, row, log2h)
        v = _seg_scan(v, m, 0, True, row, log2h)
        return v

    lbl = jax.lax.fori_loop(0, iters, lambda _, v: step(v), step(lbl))
    out_ref[0] = lbl.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("max_iters", "connectivity", "interpret")
)
def connected_components_pallas(
    mask: jnp.ndarray,
    max_iters: int = 10,
    connectivity: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) {0,1} mask -> int32 labels (component max id, 0 = bg).

    Drop-in for ops.cc.connected_components; the fixed iteration count
    mirrors the caller's max_iters budget (the XLA while_loop's early
    exit never fires on real pages — see ocr/linedet.py)."""
    B, H, W = mask.shape
    kern = functools.partial(
        _cc_kernel, iters=max_iters, connectivity=connectivity
    )
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
    )(mask.astype(jnp.float32))
