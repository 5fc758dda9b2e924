"""Native PDF engine tests: parse/extract/decode/render vs the synthetic
book's ground truth."""
import numpy as np
import pytest

from synapta_tpu.io.ingest import open_pdf
from synapta_tpu.io.pdf_writer import make_test_book


@pytest.fixture(scope="module")
def book(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pdf") / "book.pdf")
    truths = make_test_book(path, pages=8, seed=3)
    return open_pdf(path), truths


def iou(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def test_page_count_and_size(book):
    doc, truths = book
    assert doc.page_count == len(truths) == 8
    assert doc.page_size(0) == (612.0, 792.0)


def test_text_spans_match_truth(book):
    doc, truths = book
    matched = total = 0
    for p in range(8):
        spans = doc.page_spans(p)
        for tb in truths[p].text_blocks:
            total += 1
            best = 0.0
            for s in spans:
                if s["text"].startswith(tb["text"][:20]) or tb["text"].startswith(
                    s["text"][:20]
                ):
                    best = max(best, iou(s["bbox"], tb["bbox"]))
            if best > 0.5:
                matched += 1
    assert matched / total > 0.95, f"only {matched}/{total} text spans matched"


def test_font_sizes_extracted(book):
    doc, _ = book
    sizes = {round(s["size"]) for s in doc.page_spans(0)}
    assert 15 in sizes  # chapter heading
    assert 10 in sizes  # body


def test_drawings_on_chart_page(book):
    doc, truths = book
    # page 1 = bar chart: grid lines + axes + bars
    d = doc.page_drawings(1)
    assert len(d) >= 8
    rects = [x for x in d if x["is_rect"] and x["kind"] in (1, 2)]
    assert len(rects) >= truths[1].visuals[0].extra["bars"]
    # drawings lie within the truth visual bbox (plus caption band)
    vb = truths[1].visuals[0].bbox
    for x in rects:
        assert iou(x["bbox"], vb) > 0 or (
            vb[0] - 5 <= x["bbox"][0] and x["bbox"][2] <= vb[2] + 5
        )


def test_embedded_image_decode_exact(book):
    doc, truths = book
    # page 4 = embedded photo (FlateDecode RGB -> decode must be exact)
    ims = doc.page_images(4)
    assert len(ims) == 1
    truth = truths[4].visuals[0]
    assert iou(ims[0]["bbox"], truth.bbox) > 0.98
    arr = doc.decode_image(ims[0]["obj"])
    assert arr is not None
    assert list(arr.shape) == truth.extra["shape"]


def test_render_region_consistent_with_page(book):
    doc, _ = book
    full = doc.render(1, dpi=72)
    region = doc.render(1, dpi=72, clip=[100, 200, 300, 400])
    sub = full[200:400, 100:300]
    # identical up to AA boundary effects at the crop edge
    diff = np.abs(sub.astype(int) - region.astype(int))
    assert (diff > 8).mean() < 0.02


def test_render_dpi_scaling(book):
    doc, _ = book
    a = doc.render(0, dpi=36)
    b = doc.render(0, dpi=72)
    assert b.shape[0] == 2 * a.shape[0] and b.shape[1] == 2 * a.shape[1]


def test_render_has_ink(book):
    doc, _ = book
    arr = doc.render(0, dpi=72)
    assert arr.mean() > 200  # mostly white page
    assert (arr < 128).any()  # but with dark text ink


def test_jpeg_book_decodes(tmp_path):
    path = str(tmp_path / "jpeg_book.pdf")
    truths = make_test_book(path, pages=5, seed=7, jpeg_images=True)
    doc = open_pdf(path)
    ims = doc.page_images(4)
    assert len(ims) == 1
    arr = doc.decode_image(ims[0]["obj"])
    assert arr is not None and arr.shape[2] == 3
    # JPEG is lossy; compare statistics only
    assert 20 < arr.mean() < 240


def test_text_blocks_grouping(book):
    doc, _ = book
    blocks = doc.page_text_blocks(0)
    # the wrapped paragraph should merge into one block of >200 chars
    assert any(len(b["text"]) > 200 for b in blocks)
