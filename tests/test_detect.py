"""Detection engine: recall/IoU vs fixture ground truth, validation scoring,
conflict resolution."""
import numpy as np
import pytest

from synapta_tpu.io.ingest import open_pdf
from synapta_tpu.io.pdf_writer import make_test_book
from synapta_tpu.schema import BoundingBox
from synapta_tpu.vision.captions import (
    detect_caption,
    is_true_caption,
    match_caption,
    reference_keys_for,
)
from synapta_tpu.vision.detect import DetectionEngine


@pytest.fixture(scope="module")
def detected(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("det") / "book.pdf")
    truths = make_test_book(path, pages=16, seed=5)
    doc = open_pdf(path)
    eng = DetectionEngine(doc)
    per_page = [eng.detect_page(p) for p in range(16)]
    return truths, per_page, eng, doc


def test_recall_and_iou(detected):
    truths, per_page, _, _ = detected
    tp = total = 0
    ious = []
    for p, t in enumerate(truths):
        for v in t.visuals:
            total += 1
            vb = BoundingBox(*v.bbox, 612, 792)
            best = max((r.bbox.iou(vb) for r in per_page[p]), default=0.0)
            ious.append(best)
            if best > 0.5:
                tp += 1
    assert tp == total, f"recall {tp}/{total}"
    assert float(np.mean(ious)) > 0.85


def test_no_false_positives_on_text_pages(detected):
    truths, per_page, _, _ = detected
    for p, t in enumerate(truths):
        if not t.visuals:  # text-only pages
            assert per_page[p] == []


def test_caption_regions_carry_figure_numbers(detected):
    truths, per_page, _, _ = detected
    found = [
        r
        for regions in per_page
        for r in regions
        if r.extraction_method == "caption_based"
    ]
    assert found
    for r in found:
        assert r.figure_number and r.caption_text.startswith("Figure")
        assert r.reference_keys == reference_keys_for(r.figure_number)


def test_embedded_images_validated(detected):
    truths, per_page, _, _ = detected
    embedded = [
        r
        for regions in per_page
        for r in regions
        if r.extraction_method == "embedded_image"
    ]
    assert embedded
    for r in embedded:
        assert r.confidence >= 0.5
        assert r.notes.startswith("Validation:")
        assert "good_size" in r.notes or "moderate_size" in r.notes


def test_caption_pattern_gates():
    m = match_caption("Figure 3.2 Portfolio frontier")
    assert m and m.group(1) == "3.2"
    assert is_true_caption("Figure 3.2 Portfolio frontier", m)
    ref_text = "returns are low as shown in Figure 3.2 and discussed"
    m2 = match_caption(ref_text)
    assert m2 and not is_true_caption(ref_text, m2)
    long_text = "Figure 1.1 " + "x" * 500
    m3 = match_caption(long_text)
    assert m3 and not is_true_caption(long_text, m3)


def test_detect_caption_proximity():
    blocks = [
        {"text": "Figure 7.3: Yield curve shifts", "bbox": [100, 420, 300, 432]},
        {"text": "unrelated paragraph far away", "bbox": [100, 700, 300, 730]},
    ]
    bbox = BoundingBox(90, 200, 420, 410, 612, 792)
    fig, caption = detect_caption(blocks, bbox)
    assert fig == "7.3"
    assert caption.startswith("Yield curve")


def test_conflict_resolution_prefers_caption_with_drawings(detected):
    _, per_page, eng, _ = detected
    # chart pages must end up caption_based (vector drawings dominate)
    chart_regions = [r for regions in per_page for r in regions
                     if r.extraction_method == "caption_based"]
    assert len(chart_regions) >= 8


def test_render_region_shape(detected):
    _, per_page, eng, _ = detected
    r = next(r for regions in per_page for r in regions)
    arr, png = eng.render_region(r.page_num, r.bbox)
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert png.startswith(b"\x89PNG")
    scale = 150 / 72
    assert abs(arr.shape[1] - (r.bbox.x1 - r.bbox.x0) * scale) <= 2
