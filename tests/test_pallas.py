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
