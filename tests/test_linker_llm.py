"""Concept linker + vision-LLM parsing/conversion + xlsx round-trip."""
import json

import pytest

from synapta_tpu.config import VisionLLMConfig
from synapta_tpu.io.xlsx import read_taxonomy, write_xlsx
from synapta_tpu.linker.concepts import ConceptLinker, parse_concept_name
from synapta_tpu.llm.fake import DisabledClient, FakePixtralClient
from synapta_tpu.llm.pixtral import (
    convert_metadata,
    fallback_analysis,
    parse_calculations,
    parse_comprehensive,
    parse_mermaid,
)
from synapta_tpu.schema import (
    BoundingBox,
    OCRResult,
    VisualSegment,
    VisualType,
)

TAX = [
    ["Level", "Concept", "Tag(s)", "Rationale", "Page(s)"],
    ["1", "Risk-Free Rate", "", "", ""],
    ["2", "Risk-Free Rate", "", "", ""],
    ["1", "Treasury Bills (T-bills)", "money market", "", ""],
    ["1", "LIBOR (London Interbank Offer Rate)", "rates", "", ""],
    ["1", "Spread", "", "", ""],
    ["2", "TED Spread", "credit", "", ""],
    ["3", "Option Pricing", "derivatives", "", ""],
]


@pytest.fixture(scope="module")
def linker(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tax") / "t.xlsx")
    write_xlsx(p, TAX)
    return ConceptLinker(read_taxonomy(p))


def _segment(**kw):
    base = dict(
        segment_id="s", segment_type=VisualType.IMAGE, book_id="b",
        page_no=1, bbox=BoundingBox(0, 0, 10, 10, 100, 100),
    )
    base.update(kw)
    return VisualSegment(**base)


def test_xlsx_roundtrip(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, TAX)
    rows = read_taxonomy(p)
    assert rows[0]["Concept"] == "Risk-Free Rate"
    assert rows[2]["Tag(s)"] == "money market"
    assert len(rows) == 7


def test_parse_concept_name_aliases():
    p = parse_concept_name("Treasury Bills (T-bills)")
    assert "t-bills" in p["acronyms"]
    assert "treasury bill" in {a.lower() for a in p["aliases"]}
    p2 = parse_concept_name("LIBOR (London Interbank Offer Rate)")
    assert "libor" in p2["acronyms"]
    assert any("offered rate" in a for a in p2["aliases"])


def test_linker_signals_and_gate(linker):
    seg = _segment(
        caption_text="The risk-free rate in the Black-Scholes model",
        summary="Option pricing with risk free rate and T-bills",
        ocr_result=OCRResult(raw_text="risk-free rate 4.5% T-bills LIBOR"),
        nearby_text="the TED spread widened",
    )
    links = linker.link_concepts(seg)
    names = [m["concept_name"] for m in links]
    assert "Risk-Free Rate" in names
    assert "TED Spread" in names
    assert "Spread" not in names  # generic single-term gate
    rf = next(m for m in links if m["concept_name"] == "Risk-Free Rate")
    assert rf["bloom_level"] == 1  # dedup kept the lowest level
    assert rf["match_details"]["exact_phrase"] == 30.0
    assert rf["match_method"] == "exact_phrase_match"
    assert set(rf["match_details"]) == {
        "exact_phrase", "cosine_similarity", "term_overlap",
        "fuzzy_match", "context_bonus",
    }


def test_linker_fuzzy_ocr_typo(linker):
    # fuzzy is a 10-point signal: both terms within 0.88 similarity fire
    # the multi-term rule (0.9); it supplements but never links alone,
    # matching the reference's weighting (ref :2585-2650)
    c = next(c for c in linker.concepts if c.name == "Option Pricing")
    words = ["optionn", "prcing", "models"]
    assert linker._score_fuzzy(c, words) == pytest.approx(0.9)
    assert linker._score_fuzzy(c, ["opiton", "banana"]) == 0.0  # 0.83 < 0.88


def test_linker_empty_context(linker):
    assert linker.link_concepts(_segment()) == []


def test_parse_comprehensive_with_fences():
    cfg = VisionLLMConfig()
    content = """```json
{"classification": {"category": "chart", "confidence": 0.99},
 "metadata": {"chart_subtype": "bar", "has_grid": true,
              "legend_items": ["A"], "data_series_count": 2,
              "x_axis_label": "Year", "y_axis_label": "Return",
              "value_range": {"min": 1, "max": 9}},
 "summary": {"text": "A bar chart.", "confidence": 0.9}}
```"""
    out = parse_comprehensive(content, cfg)
    assert out["visual_type"] == VisualType.CHART
    assert out["confidence"] == 0.95  # capped (ref :681)
    chart, *_ = convert_metadata(out["visual_type"], out["metadata"])
    assert chart.chart_subtype == "bar" and chart.grid_detected
    assert chart.axes_info["x_axis"]["label"] == "Year"
    assert chart.value_ranges == {"detected": (1, 9)}
    assert chart.series_count == 2


def test_parse_comprehensive_garbage_returns_none():
    assert parse_comprehensive("not json at all", VisionLLMConfig()) is None
    fb = fallback_analysis()
    assert fb["visual_type"] == VisualType.FIGURE and fb["confidence"] == 0.3


def test_convert_metadata_image_null_tolerance():
    _, _, image, _ = convert_metadata(
        VisualType.IMAGE,
        {"formulas": None, "definitions": [{"term": "PV", "definition": "x"}],
         "image_subtype": "screenshot", "contains_text": True},
    )
    assert image.formulas == []  # null -> []
    assert image.definitions[0]["term"] == "PV"
    assert image.image_subtype == "screenshot"


def test_convert_metadata_flowchart():
    _, diagram, _, _ = convert_metadata(
        VisualType.FLOWCHART,
        {"node_count": 5, "decision_points": 2, "has_hierarchy": True},
    )
    assert diagram.diagram_subtype == "flowchart"
    assert diagram.has_decision_points and diagram.node_count == 5


def test_parse_mermaid():
    cfg = VisionLLMConfig()
    content = "Here:\n```mermaid\nflowchart TD\n  A-->B\n```"
    m = parse_mermaid(content, cfg)
    assert m.diagram_type == "flowchart"
    assert m.extraction_confidence == 0.75
    assert parse_mermaid("no code block", cfg) is None


def test_parse_calculations():
    data = {
        "input_variables": [{"variable": "r", "value": "4", "unit": "%"}],
        "output_values": [{"output_name": "PV", "value": "9", "location": "A1"}],
        "verification": {"verified": True, "matches": True, "differences": []},
    }
    out = parse_calculations("prose " + json.dumps(data) + " more prose")
    assert out["input_variables"][0]["variable"] == "r"
    assert out["calculation_verification"]["verified"] is True
    assert parse_calculations("nothing")["input_variables"] == []


def test_fake_and_disabled_clients():
    import numpy as np

    img = np.zeros((8, 8, 3), np.uint8)
    fake = FakePixtralClient()
    r = fake.submit_comprehensive(img, None).result()
    assert r["method"] == "mistral_vision_comprehensive"
    dis = DisabledClient()
    r2 = dis.analyze_comprehensive(img, None)
    assert r2["method"] == "fallback_heuristic" and not dis.enabled
    assert dis.extract_mermaid(img, VisualType.FLOWCHART, None) is None
