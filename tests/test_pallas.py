"""Pallas fused kernel parity vs the XLA reference path (interpret mode on
CPU; compiled on TPU)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from synapta_tpu.io.ingest import open_pdf
from synapta_tpu.io.pdf_writer import make_test_book
from synapta_tpu.ops.color import rgb_to_gray
from synapta_tpu.ops.features import _open_iter2
from synapta_tpu.ops.filters import box_count, sobel_edges
from synapta_tpu.ops.pallas_kernels import fused_edge_stats


def test_fused_edge_stats_parity(tmp_path):
    path = str(tmp_path / "b.pdf")
    make_test_book(path, pages=3, seed=2)
    doc = open_pdf(path)
    arr = doc.render(1, dpi=72 * 512 / 360, clip=[110, 180, 470, 415])
    canvas = np.full((2, 512, 512, 3), 255, np.uint8)
    canvas[0, : arr.shape[0], : arr.shape[1]] = arr[:512, :512]
    gray = np.asarray(rgb_to_gray(jnp.asarray(canvas)))

    stats = np.asarray(fused_edge_stats(jnp.asarray(gray)))

    e, _, _ = sobel_edges(jnp.asarray(gray))
    ef = e.astype(jnp.float32)
    ref = [
        float(box_count(e)[0]),
        float(box_count(_open_iter2(ef, 20, 1) > 0)[0]),
        float(box_count(_open_iter2(ef, 1, 20) > 0)[0]),
        float(box_count(_open_iter2(ef, 1, 25) > 0)[0]),
        float(box_count(_open_iter2(ef, 25, 1) > 0)[0]),
    ]
    for got, want in zip(stats[0], ref):
        assert abs(got - want) <= max(0.03 * want, 4.0), (stats[0], ref)
    # blank crop row: all zeros
    assert stats[1].sum() == 0.0


def test_pallas_cc_parity_random():
    """Pallas in-VMEM label propagation == XLA segmented-scan CC, exact
    label-map equality at convergence (identical unique-id init)."""
    from synapta_tpu.ops.cc import connected_components
    from synapta_tpu.ops.pallas_cc import connected_components_pallas

    rng = np.random.default_rng(11)
    # blobby mask: random rectangles + specks on a 2-image batch
    mask = np.zeros((2, 64, 128), np.float32)
    for b in range(2):
        for _ in range(12):
            y, x = rng.integers(0, 56), rng.integers(0, 118)
            h, w = rng.integers(2, 9), rng.integers(2, 11)
            mask[b, y:y + h, x:x + w] = 1.0
        sp = rng.random((64, 128)) < 0.04
        mask[b][sp] = 1.0

    want = np.asarray(connected_components(jnp.asarray(mask), max_iters=64))
    got = np.asarray(connected_components_pallas(
        jnp.asarray(mask), max_iters=64, interpret=True))
    assert (got == want).all()


def test_pallas_cc_parity_diagonal_and_conn4():
    """Diagonal-only chains (8-conn) and 4-conn isolation behave
    identically to the XLA path."""
    from synapta_tpu.ops.cc import connected_components
    from synapta_tpu.ops.pallas_cc import connected_components_pallas

    mask = np.zeros((1, 32, 128), np.float32)
    for i in range(20):            # a diagonal staircase
        mask[0, 5 + i % 20, 30 + i] = 1.0
    mask[0, 2, 2] = 1.0            # isolated speck
    mask[0, 28, 100:110] = 1.0     # bar

    for conn in (8, 4):
        want = np.asarray(connected_components(
            jnp.asarray(mask), max_iters=64, connectivity=conn))
        got = np.asarray(connected_components_pallas(
            jnp.asarray(mask), max_iters=64, connectivity=conn,
            interpret=True))
        assert (got == want).all(), f"conn={conn}"
