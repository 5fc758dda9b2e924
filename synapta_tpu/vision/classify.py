"""Classification heuristics: decision layer over the TPU feature batch.

Implements the reference's multi-signal subtype/structure decisions
(ref pdf_image_segmentation.py:1320-1461, 1546-1617, 1656-1838) using the
numeric features produced in one fused device pass by
``synapta_tpu.ops.features.extract_crop_features``. Only threshold
comparisons, keyword regexes, and component-stat lookups run here — the
pixel work never leaves HBM.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np

from synapta_tpu.config import HeuristicsConfig
from synapta_tpu.ops.cc import component_stats


class CropFeatures:
    """Per-crop view over the batched feature dict (host-side numpy)."""

    def __init__(self, batch: Dict[str, Any], index: int, height: int, width: int):
        self._b = {k: np.asarray(v) for k, v in batch.items()}
        self.i = index
        self.height = height
        self.width = width

    def __getattr__(self, name):
        b = object.__getattribute__(self, "_b")
        if name in b:
            return b[name][object.__getattribute__(self, "i")]
        raise AttributeError(name)


_NUMERIC_RE = re.compile(r"^[\d\-/.,\s%$€£¥]+$")


def detect_chart_subtype(
    f: CropFeatures, ocr_text: str, cfg: HeuristicsConfig = HeuristicsConfig()
) -> Optional[str]:
    """Multi-signal chart-subtype scoring (ref :1343-1461)."""
    text = (ocr_text or "").lower()
    h, w = f.height, f.width
    scores: Dict[str, float] = {}

    def bump(k, v):
        scores[k] = scores.get(k, 0.0) + v

    # signal 1: text
    if re.search(r"\bpie\b", text) and "chart" in text:
        bump("pie", cfg.text_signal_score)
    if "scatter" in text or "correlation" in text:
        bump("scatter", cfg.text_signal_score)
    if "candlestick" in text or all(wd in text for wd in ("open", "close")):
        bump("candlestick", cfg.text_signal_score)
    if re.search(r"\bbar\b.*\bchart\b|\bbar\b.*\bgraph\b", text):
        bump("bar", cfg.text_signal_score)
    if re.search(r"\bline\b.*\bchart\b|\bline\b.*\bgraph\b", text):
        bump("line", cfg.text_signal_score)

    # signal 2: visual structure. The reference's edge-only criterion
    # (v_pixels > 10*width, ref :1399) misses FILLED bars — which only
    # contribute outline edges — so an ink-based tall-component census
    # backs it up (deliberate improvement, see SURVEY.md §7 "quirks").
    v_pixels = float(f.v_pixels)
    h_pixels = float(f.h_pixels)
    n_bars = count_vertical_bars(f)
    if n_bars >= cfg.bar_min_tall_contours:
        bump("bar", 2.5)
        if v_pixels > w * cfg.bar_v_pixels_factor or float(f.v_ink_pixels) > 0.02 * h * w:
            bump("bar", 1.0)
    elif h_pixels > h * cfg.line_h_pixels_factor and h_pixels > v_pixels * cfg.line_hv_ratio:
        bump("line", 2.5)
        if float(f.long_h_pixels) >= w * 0.2:
            bump("line", 1.5)
    elif v_pixels > w * cfg.bar_v_pixels_factor:
        bump("bar", 2.0)

    # signal 3: pie (only without strong line/bar evidence, ref :1411-1413)
    if scores.get("line", 0.0) < 2.0 and scores.get("bar", 0.0) < 2.0:
        min_dim = min(h, w)
        if (
            float(f.ring_score) > 3.0
            and float(f.ring_radius) > min_dim * 0.2
            and float(f.circle_edge_density) > cfg.pie_edge_density
            and float(f.ring_coverage) > 0.8
        ):
            bump("pie", 2.5)

    if scores:
        best = max(scores, key=lambda k: scores[k])
        if scores[best] >= cfg.min_subtype_score:
            return best
    return "unknown"


def count_vertical_bars(f: CropFeatures) -> int:
    """Tall vertical ink components (ref :1403-1406) — the census runs on
    device inside the feature pass (h > 0.2*H, h > 1.2w, w >= 5px; the
    width floor excludes axis lines and steep 1-2px series strokes)."""
    return int(f.tall_bars)


def detect_grid(f: CropFeatures, cfg: HeuristicsConfig = HeuristicsConfig()) -> bool:
    """Grid = substantial long lines both directions (ref :1546-1564)."""
    return float(f.grid_h) > cfg.grid_min_pixels and float(f.grid_v) > cfg.grid_min_pixels


def count_arrows(f: CropFeatures, cfg: HeuristicsConfig = HeuristicsConfig()) -> int:
    """Diagonal-line arrow proxy (ref :1320-1341): the reference counts
    HoughLinesP segments at diagonal angles then //3 caps at 20; the dense
    equivalent divides diagonal-run pixel mass by a nominal segment
    length (30px)."""
    segments = float(f.diag_pixels) / 30.0
    return int(min(segments // cfg.arrow_divisor, cfg.arrow_cap))


def count_connections(f: CropFeatures, cfg: HeuristicsConfig = HeuristicsConfig()) -> List[Dict]:
    """Line-segment connection records (ref :1695-1711)."""
    n = int(min(float(f.line_pixels) / 30.0, cfg.connection_cap))
    return [{"id": f"conn_{i}", "type": "arrow"} for i in range(n)]


def estimate_data_points(f: CropFeatures, cfg: HeuristicsConfig = HeuristicsConfig()) -> int:
    """Blob-based data point estimate with edge-density fallback
    (ref :1596-1617); the blob census runs on device."""
    blobs = int(f.blob_count)
    if blobs > 5:
        return blobs
    return int(min(float(f.edge_count) // cfg.edge_points_divisor, cfg.data_points_cap))


def detect_shapes(f: CropFeatures) -> Dict[str, int]:
    """Shape census over ink components (ref :1753-1775 — whose diamond
    branch was dead code; fixed here deliberately: a '4-corner' component
    whose extreme points sit mid-edge is counted as a diamond)."""
    return {
        "rectangles": int(f.shapes_rect),
        "circles": int(f.shapes_circle),
        "diamonds": int(f.shapes_diamond),
    }


def detect_decision_points(f: CropFeatures, ocr_text: str) -> bool:
    """Keywords or diamond shapes (ref :1777-1789).

    Deviation from the reference (documented): keywords match on WORD
    BOUNDARIES — the reference's substring test fires "if" inside
    "diversification" and "no" inside "normal", tagging ordinary charts
    as decision-bearing."""
    text = (ocr_text or "").lower()
    kws = ("if", "yes", "no", "decision", "choose", "select")
    if any(re.search(rf"\b{k}\b", text) for k in kws):
        return True
    return detect_shapes(f).get("diamonds", 0) > 0


def detect_diagram_subtype(ocr_text: str) -> str:
    """Keyword map (ref :1656-1674)."""
    text = (ocr_text or "").lower()
    for kws, label in [
        (("process", "flow"), "process_flow"),
        (("decision",), "decision_tree"),
        (("hierarchy", "organization"), "hierarchy"),
        (("cycle", "circular"), "cycle"),
        (("cause", "effect"), "causal"),
        (("system",), "system"),
    ]:
        if any(k in text for k in kws):
            return label
    return "unknown"


def detect_hierarchy(nodes: List[Dict], y_range_min: float = 100.0) -> bool:
    """Nodes spanning >100px vertically (ref :1713-1726)."""
    if len(nodes) < 3:
        return False
    ys = [n["bbox"][1] for n in nodes if n.get("bbox")]
    return bool(ys) and (max(ys) - min(ys)) > y_range_min


def detect_layout_type(nodes: List[Dict], ratio: float = 2.0) -> Optional[str]:
    """x/y variance comparison (ref :1728-1751)."""
    pos = [(n["bbox"][0], n["bbox"][1]) for n in nodes if n.get("bbox")]
    if len(pos) < 2:
        return None
    xv = float(np.var([p[0] for p in pos]))
    yv = float(np.var([p[1] for p in pos]))
    if yv > xv * ratio:
        return "hierarchical_vertical"
    if xv > yv * ratio:
        return "hierarchical_horizontal"
    return "free_form"


def detect_image_subtype(f: CropFeatures, ocr_text: str,
                         cfg: HeuristicsConfig = HeuristicsConfig()) -> str:
    """Text-density / variance split (ref :1791-1810)."""
    n = len(ocr_text or "")
    if n > cfg.scanned_page_chars:
        return "scanned_page"
    if n > cfg.screenshot_chars:
        return "screenshot"
    return "photo" if float(f.variance) > cfg.photo_variance else "illustration"


def detect_embedded_table(raw_text: str, cfg: HeuristicsConfig = HeuristicsConfig()) -> bool:
    """Numeric-line density (ref :1812-1826)."""
    if not raw_text:
        return False
    lines = raw_text.split("\n")
    numeric = sum(1 for ln in lines if re.search(r"\d+", ln))
    return numeric > len(lines) * cfg.table_numeric_frac and len(lines) > cfg.table_min_lines


def estimate_content_type(ocr_text: str) -> str:
    """(ref :1828-1838)"""
    text = (ocr_text or "").lower()
    if any(k in text for k in ("window", "button", "menu")):
        return "interface"
    if len(text) > 300:
        return "document"
    return "mixed"
