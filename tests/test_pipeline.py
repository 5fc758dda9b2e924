"""End-to-end pipeline tests (hermetic: fake/disabled LLM clients)."""
import json
import os

import pytest

from synapta_tpu.config import PipelineConfig
from synapta_tpu.io.pdf_writer import make_test_book
from synapta_tpu.io.xlsx import write_xlsx
from synapta_tpu.llm.fake import DisabledClient, FakePixtralClient
from synapta_tpu.models.train import WEIGHTS_PATH
from synapta_tpu.pipeline import VisualSegmentationPipeline
from synapta_tpu.schema import VisualType

needs_weights = pytest.mark.skipif(
    not os.path.exists(WEIGHTS_PATH),
    reason="recognizer weights not trained yet",
)

TAX = [
    ["Level", "Concept", "Tag(s)", "Rationale", "Page(s)"],
    ["1", "Portfolio Diversification", "risk", "", ""],
    ["1", "Quarterly Returns", "periods", "", ""],
    ["2", "Cumulative Performance", "stocks bonds", "", ""],
    ["1", "Investment Decision Process", "approval", "", ""],
]


@pytest.fixture(scope="module")
def book(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    pdf = str(d / "book.pdf")
    truths = make_test_book(pdf, pages=8, seed=11)
    tax = str(d / "tax.xlsx")
    write_xlsx(tax, TAX)
    return pdf, tax, truths, d


@pytest.fixture(scope="module")
def run(book):
    pdf, tax, truths, d = book
    out = str(d / "out")
    pipe = VisualSegmentationPipeline(
        book_id="testbook",
        pdf_path=pdf,
        taxonomy_path=tax,
        output_dir=out,
        use_mermaid=True,
        config=PipelineConfig(use_vision_llm=False),
        llm_client=DisabledClient(),
        resume=False,
    )
    segs = pipe.process()
    payload = json.load(open(os.path.join(out, "testbook_visual_segments.json")))
    return pipe, segs, payload, out, truths


@needs_weights
def test_outputs_exist_and_schema(run):
    pipe, segs, payload, out, truths = run
    assert payload["book_id"] == "testbook"
    assert payload["total_segments"] == len(payload["segments"]) == len(segs)
    assert payload["total_segments"] >= 7  # 7 visual pages in 8-page cycle
    for s in payload["segments"]:
        assert set(s) >= {
            "segment_id", "segment_type", "book_id", "page_no", "bbox",
            "image_path", "ocr_result", "extracted_text_structured",
            "classification_confidence", "classification_method",
            "linked_concept_ids", "extraction_method", "confidence", "notes",
        }
        assert os.path.exists(s["image_path"])
    assert os.path.exists(os.path.join(out, "testbook_visual_summary.csv"))
    import csv as _csv

    with open(os.path.join(out, "testbook_visual_summary.csv")) as f:
        rows = list(_csv.reader(f))
    assert rows[0] == [
        "segment_id", "page", "type", "confidence", "figure_number",
        "caption", "ocr_text", "linked_concepts", "summary",
    ]
    assert len(rows) == payload["total_segments"] + 1


@needs_weights
def test_classification_quality(run):
    _, segs, payload, _, truths = run
    # map truth kind -> expected type per page
    kind_by_page = {}
    for t in truths:
        for v in t.visuals:
            kind_by_page.setdefault(t.page_no + 1, []).append(v.kind)
    expected = {
        "chart_bar": VisualType.CHART,
        "chart_line": VisualType.CHART,
        "chart_pie": VisualType.CHART,
        "flowchart": VisualType.FLOWCHART,
    }
    hits = total = 0
    for s in segs:
        kinds = kind_by_page.get(s.page_no, [])
        for k in kinds:
            if k in expected:
                total += 1
                if s.segment_type == expected[k]:
                    hits += 1
    assert total >= 4
    assert hits / total >= 0.75, f"classified {hits}/{total}"


@needs_weights
def test_ocr_and_payloads(run):
    _, segs, _, _, _ = run
    charts = [s for s in segs if s.segment_type == VisualType.CHART]
    assert charts
    for s in charts:
        assert s.chart_data is not None  # local CV payload filled
    with_text = [s for s in segs if s.ocr_result and s.ocr_result.raw_text]
    assert len(with_text) >= len(segs) - 2
    # caption text recovered for captioned figures
    capd = [s for s in segs if s.caption_text]
    assert any("Figure" in (s.caption_text or "") for s in capd)


@needs_weights
def test_concept_linking_happened(run):
    _, segs, _, _, _ = run
    linked = [m for s in segs for m in s.linked_concept_ids]
    assert linked
    for m in linked:
        assert 0.5 < m["confidence"] <= 1.0
        assert m["match_details"]


@needs_weights
def test_fallback_summaries_and_context(run):
    _, segs, _, _, _ = run
    for s in segs:
        assert s.summary  # fallback summary at minimum
        assert s.heading_path  # chapter headings above every visual
        assert s.nearby_text


@needs_weights
def test_resume_skips_done_segments(book):
    pdf, tax, truths, d = book
    out = str(d / "out2")
    mk = lambda: VisualSegmentationPipeline(  # noqa: E731
        book_id="r", pdf_path=pdf, taxonomy_path=None, output_dir=out,
        config=PipelineConfig(use_vision_llm=False),
        llm_client=DisabledClient(), resume=True,
    )
    p1 = mk()
    p1.process()
    first = p1.stats.segments
    assert first > 0
    p2 = mk()
    p2.process()
    assert p2.stats.segments == 0  # everything deduped via checkpoint
    payload = json.load(open(os.path.join(out, "r_visual_segments.json")))
    assert payload["total_segments"] == first

    # ids hash RAW pixels, not encoded PNGs: resume must still dedup when
    # the PNG encoder changes (regression: palettization re-id'd every
    # segment). Forcing the PIL fallback changes the bytes, not the id.
    import unittest.mock as _mock

    with _mock.patch(
        "synapta_tpu.io.ingest.png_encode",
        side_effect=RuntimeError("encoder swapped"),
    ):
        p3 = mk()
        p3.process()
    assert p3.stats.segments == 0
    payload = json.load(open(os.path.join(out, "r_visual_segments.json")))
    assert payload["total_segments"] == first


@needs_weights
def test_fake_llm_flow(book):
    pdf, tax, truths, d = book
    out = str(d / "out3")
    fake = FakePixtralClient(hint_fn=lambda px, ocr: {
        "visual_type": VisualType.IMAGE,
        "confidence": 0.93,
        "metadata": {"image_subtype": "photo", "contains_text": False},
        "summary": "A photo-like visual.",
        "summary_confidence": 0.9,
        "method": "mistral_vision_comprehensive",
    })
    pipe = VisualSegmentationPipeline(
        book_id="f", pdf_path=pdf, output_dir=out,
        config=PipelineConfig(use_vision_llm=True),
        llm_client=fake, resume=False,
    )
    segs = pipe.process()
    assert all(s.classification_method == "mistral_vision_comprehensive" for s in segs)
    assert all(s.segment_type == VisualType.IMAGE for s in segs)
    # IMAGE segments got the calculation second call
    assert any(c[0] == "calculations" for c in fake.calls)
    img_segs = [s for s in segs if s.image_data]
    assert img_segs and img_segs[0].image_data.input_variables


def test_rotated_scanned_page_end_to_end(tmp_path):
    """A realistic rotated scan: content stored landscape with the image
    drawn sideways, /Rotate 90 displaying it portrait. The pipeline must
    operate entirely in display space — detection bbox, page dims, and
    crop all upright."""
    import zlib

    import numpy as np

    from tests.fontfixtures import _pdf

    H, W = 140, 100
    img = np.full((H, W, 3), 235, np.uint8)
    img[10:60, 10:90] = [40, 80, 160]
    rng = np.random.RandomState(7)
    img[10:60, 10:90] += rng.randint(0, 60, (50, 80, 3)).astype(np.uint8)
    img[80:130, 20:80] = 30
    raw = zlib.compress(img.tobytes())
    content = b"q 0 -300 400 0 196 456 cm /Im1 Do Q"
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 792 612] "
        b"/Rotate 90 /Contents 4 0 R /Resources "
        b"<< /XObject << /Im1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() +
        b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width " + str(W).encode() +
        b" /Height " + str(H).encode() +
        b" /ColorSpace /DeviceRGB /BitsPerComponent 8 "
        b"/Filter /FlateDecode /Length " + str(len(raw)).encode() +
        b" >>\nstream\n" + raw + b"\nendstream",
    ])
    p = tmp_path / "rotscan.pdf"
    p.write_bytes(pdf)
    pipe = VisualSegmentationPipeline(
        book_id="rotscan", pdf_path=str(p),
        output_dir=str(tmp_path / "out"), use_mermaid=False,
        config=PipelineConfig(use_vision_llm=False), resume=False)
    segs = pipe.process()
    assert pipe.stats.errors == 0
    assert len(segs) == 1
    b = segs[0].bbox
    # display space: portrait page, the sideways-drawn 400x300 image
    # appears as an upright 300x400 region
    assert (b.page_width, b.page_height) == (612.0, 792.0)
    assert (round(b.x0), round(b.y0), round(b.x1), round(b.y1)) == (
        156, 196, 456, 596)
