"""L0 golden tests: schema round-trips byte-identically to the reference's
sample output (ref sample: extracted_visuals_excelSS/)."""
import json

from synapta_tpu.io.writers import ResultsWriter, segment_id_for
from synapta_tpu.schema import (
    BoundingBox,
    ChartSpecificData,
    OCRResult,
    VisualSegment,
    VisualType,
    segment_from_dict,
    to_builtin,
)


def test_golden_json_roundtrip(golden_segments_path, tmp_path):
    """Deserialize the golden segment, re-serialize through our schema, and
    compare the full file byte-for-byte."""
    raw = golden_segments_path.read_text(encoding="utf-8")
    golden = json.loads(raw)
    segs = [segment_from_dict(d) for d in golden["segments"]]

    w = ResultsWriter(
        golden["book_id"], golden["pdf_path"], str(tmp_path / "out")
    )
    for s in segs:
        assert w.append(s)
    w.finalize()

    ours = (tmp_path / "out" / "textbook_001_visual_segments.json").read_text(
        encoding="utf-8"
    )
    assert ours == raw


def test_golden_csv_roundtrip(golden_segments_path, golden_csv_path, tmp_path):
    golden = json.loads(golden_segments_path.read_text(encoding="utf-8"))
    w = ResultsWriter(golden["book_id"], golden["pdf_path"], str(tmp_path / "o"))
    for d in golden["segments"]:
        w.append(segment_from_dict(d))
    w.finalize()
    ours = (tmp_path / "o" / "textbook_001_visual_summary.csv").read_text(
        encoding="utf-8"
    )
    assert ours == golden_csv_path.read_text(encoding="utf-8")


def test_segment_id_scheme():
    sid = segment_id_for("textbook_001", 0, b"pixels")
    assert sid.startswith("textbook_001_p000_") and len(sid.split("_")[-1]) == 8


def test_details_blocks_and_caps():
    seg = VisualSegment(
        segment_id="b_p000_deadbeef",
        segment_type=VisualType.CHART,
        book_id="b",
        page_no=1,
        bbox=BoundingBox(0, 0, 10, 10, 100, 100),
        chart_data=ChartSpecificData(chart_subtype="bar", legend_items=["a"]),
    )
    d = seg.to_dict()
    assert d["chart_details"]["subtype"] == "bar"
    assert "diagram_details" not in d
    assert list(d["bbox"]) == [
        "x0", "y0", "x1", "y1", "width", "height", "page_width", "page_height",
    ]
    # numpy coercion
    import numpy as np

    seg.ocr_result = OCRResult(raw_text="x", confidence=np.float32(0.5))
    d = seg.to_dict()
    assert isinstance(d["ocr_result"]["confidence"], float)
    assert to_builtin({"a": np.int64(3)}) == {"a": 3}


def test_resume_from_jsonl(tmp_path, golden_segments_path):
    golden = json.loads(golden_segments_path.read_text(encoding="utf-8"))
    out = str(tmp_path / "r")
    w1 = ResultsWriter("textbook_001", "x.pdf", out)
    w1.append(segment_from_dict(golden["segments"][0]))
    # simulate crash: new writer, recover from jsonl
    w2 = ResultsWriter("textbook_001", "x.pdf", out)
    assert w2.load_checkpoint() == 1
    assert w2.has_segment(golden["segments"][0]["segment_id"])
    assert not w2.append(segment_from_dict(golden["segments"][0]))  # dedup
    w2.finalize()
    final = json.loads((tmp_path / "r" / "textbook_001_visual_segments.json").read_text())
    assert final["total_segments"] == 1


def test_bbox_geometry():
    a = BoundingBox(0, 0, 10, 10, 100, 100)
    b = BoundingBox(5, 5, 15, 15, 100, 100)
    assert a.area() == 100
    assert a.intersect_area(b) == 25
    assert abs(a.iou(b) - 25 / 175) < 1e-9
