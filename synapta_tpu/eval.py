"""Accuracy evaluation harness.

BASELINE.md's parity targets are bbox IoU >= 0.95 and OCR CER parity vs the
CPU reference (PyMuPDF + PaddleOCR). That stack does not exist in this
environment (no fitz, no paddle), so the harness measures against the
synthetic ground truth that the fixture generator emits — a *stricter*
oracle than re-running the reference, since truth is exact.

    python -m synapta_tpu.eval [--pages 16] [--seed 3]

Prints one JSON line: detection recall/IoU, classification accuracy, OCR CER.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import tempfile
from typing import Dict, List

import numpy as np


def norm_text(s: str) -> str:
    return re.sub(r"\s+", " ", (s or "").strip().lower())


def evaluate_book(pages: int = 16, seed: int = 3, use_llm: bool = False) -> Dict:
    from synapta_tpu.config import PipelineConfig
    from synapta_tpu.io.pdf_writer import make_test_book
    from synapta_tpu.llm.fake import DisabledClient
    from synapta_tpu.models.train import cer
    from synapta_tpu.pipeline import VisualSegmentationPipeline
    from synapta_tpu.schema import BoundingBox, VisualType

    tmp = tempfile.mkdtemp(prefix="synapta_eval_")
    pdf = os.path.join(tmp, "book.pdf")
    truths = make_test_book(pdf, pages=pages, seed=seed)
    pipe = VisualSegmentationPipeline(
        book_id="eval",
        pdf_path=pdf,
        output_dir=os.path.join(tmp, "out"),
        use_mermaid=False,
        config=PipelineConfig(use_vision_llm=use_llm),
        llm_client=None if use_llm else DisabledClient(),
        resume=False,
    )
    segs = pipe.process()
    by_page: Dict[int, List] = {}
    for s in segs:
        by_page.setdefault(s.page_no - 1, []).append(s)

    expected_type = {
        "chart_bar": VisualType.CHART,
        "chart_line": VisualType.CHART,
        "chart_pie": VisualType.CHART,
        "flowchart": VisualType.FLOWCHART,
        "image": VisualType.IMAGE,
        "table_image": VisualType.IMAGE,
    }

    det_tp = det_total = 0
    ious: List[float] = []
    cls_hits = cls_total = 0
    cers: List[float] = []
    for p, t in enumerate(truths):
        page_segs = by_page.get(p, [])
        for v in t.visuals:
            det_total += 1
            vb = BoundingBox(*v.bbox, 612, 792)
            best_iou, best_seg = 0.0, None
            for s in page_segs:
                i = s.bbox.iou(vb)
                if i > best_iou:
                    best_iou, best_seg = i, s
            ious.append(best_iou)
            if best_iou > 0.5:
                det_tp += 1
            if best_seg is None:
                continue
            want = expected_type.get(v.kind)
            if want is not None:
                cls_total += 1
                if best_seg.segment_type == want:
                    cls_hits += 1
            # OCR CER over the texts drawn inside the visual (+ caption)
            if v.texts and best_seg.ocr_result:
                hyp = norm_text(best_seg.ocr_result.raw_text.replace("\n", " "))
                for truth_text in v.texts:
                    ref = norm_text(truth_text)
                    if not ref:
                        continue
                    # best matching window: min CER against any hyp substring
                    # alignment: use whole-hyp CER bounded by substring search
                    if ref in hyp:
                        cers.append(0.0)
                    else:
                        # align by sliding a window of len(ref) over hyp
                        best_c = 1.0
                        step = max(1, len(ref) // 2)
                        for st in range(0, max(1, len(hyp) - len(ref) + 1), step):
                            best_c = min(best_c, cer(ref, hyp[st : st + len(ref) + 2]))
                            if best_c == 0.0:
                                break
                        cers.append(best_c)
    return {
        "pages": pages,
        "detection_recall@0.5": round(det_tp / max(det_total, 1), 4),
        "mean_iou": round(float(np.mean(ious)) if ious else 0.0, 4),
        "classification_accuracy": round(cls_hits / max(cls_total, 1), 4),
        "ocr_cer": round(float(np.mean(cers)) if cers else 1.0, 4),
        "n_truth_visuals": det_total,
        "n_detected": sum(len(v) for v in by_page.values()),
        "wall_s": round(pipe.stats.wall_s, 2),
    }


def evaluate_scanned(pages: int = 2, seed: int = 1) -> Dict:
    """Scanned-page OCR: full-page noisy rasters of REAL text (PIL-rendered
    glyphs, grey background, sensor noise, skew) through the whole
    pipeline; CER against the exact drawn text. The content class the
    reference's PaddleOCR covered (ref :1791-1810)."""
    from synapta_tpu.config import PipelineConfig
    from synapta_tpu.io.pdf_writer import make_scanned_book
    from synapta_tpu.llm.fake import DisabledClient
    from synapta_tpu.models.train import cer
    from synapta_tpu.pipeline import VisualSegmentationPipeline

    tmp = tempfile.mkdtemp(prefix="synapta_scan_")
    pdf = os.path.join(tmp, "scan.pdf")
    truths, expected = make_scanned_book(pdf, pages=pages, seed=seed)
    pipe = VisualSegmentationPipeline(
        book_id="scan",
        pdf_path=pdf,
        output_dir=os.path.join(tmp, "out"),
        use_mermaid=False,
        config=PipelineConfig(use_vision_llm=False),
        llm_client=DisabledClient(),
        resume=False,
    )
    segs = pipe.process()
    by_page = {s.page_no - 1: s for s in segs}
    cers = []
    detected = 0
    for p, want in enumerate(expected):
        seg = by_page.get(p)
        if seg is None or not seg.ocr_result:
            cers.append(1.0)
            continue
        detected += 1
        hyp = norm_text(seg.ocr_result.raw_text.replace("\n", " "))
        ref = norm_text(want.replace("\n", " "))
        cers.append(cer(ref, hyp))
    wall = pipe.stats.wall_s
    return {
        "scanned_pages": pages,
        "scanned_detected": detected,
        "scanned_ocr_cer": round(float(np.mean(cers)), 4),
        "scanned_wall_s": round(wall, 2),
        "scanned_pages_per_s": round(pages / wall, 3) if wall else 0.0,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--scanned", action="store_true",
                    help="also run the scanned-page OCR fixture")
    ap.add_argument("--scanned-pages", type=int, default=None,
                    help="page count for the scanned fixture "
                    "(default: min(--pages, 4))")
    args = ap.parse_args()
    os.environ.setdefault("SYNAPTA_LOG_LEVEL", "WARNING")
    from synapta_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    out = evaluate_book(args.pages, args.seed)
    if args.scanned:
        # scanned keys are all "scanned_"-prefixed so the merged JSON line
        # stays self-consistent (the clean run's "pages" is not clobbered)
        n = args.scanned_pages if args.scanned_pages else min(args.pages, 4)
        out.update(evaluate_scanned(pages=n))
    print(json.dumps(out))
