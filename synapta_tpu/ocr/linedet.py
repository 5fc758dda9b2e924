"""Text-line detection over crop batches.

The detection stage of the on-TPU OCR path (PaddleOCR's DBNet equivalent for
*rendered* documents): binarize ink, dilate horizontally to fuse glyphs into
line blobs (device-side, batched), then extract per-line AABBs from the CC
label maps. For crisp PDF rasters this deterministic pipeline matches or
beats a learned detector; a trainable DB-style head can swap in behind the
same interface later.

Output boxes are pixel AABBs in crop space, reading-ordered (top-to-bottom,
left-to-right), matching the reference's OCR block geometry
(ref pdf_image_segmentation.py:1128-1165).
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from synapta_tpu.ops.cc import component_stats, connected_components
from synapta_tpu.ops.color import rgb_to_gray
from synapta_tpu.ops.filters import binarize_ink, dilate, erode


@functools.partial(jax.jit, static_argnames=("merge_x", "ink_thresh"))
def line_masks(rgb: jnp.ndarray, merge_x: int = 7, ink_thresh: float = 200.0):
    """(B, H, W, 3) uint8 -> int32 line-component label maps.

    Horizontal close (dilate then erode) with a 1 x merge_x element fuses
    intra-word and inter-word gaps; a small vertical close joins accents
    and broken strokes.
    """
    gray = rgb_to_gray(rgb)
    ink = binarize_ink(gray, ink_thresh)
    fused = erode(dilate(ink, 1, merge_x), 1, max(merge_x - 2, 1))
    fused = erode(dilate(fused, 2, 1), 1, 1)
    return connected_components(fused)


def extract_line_boxes(
    labels: np.ndarray,
    min_w: int = 6,
    min_h: int = 5,
    max_h: int = 64,
    min_area: int = 24,
) -> List[List[int]]:
    """One crop's label map -> reading-ordered [x0, y0, x1, y1] line boxes.

    Components taller than max_h (drawings, bars) and smaller than the
    minima (specks) are rejected; overlapping same-row fragments merge.
    """
    stats = component_stats(np.asarray(labels), min_area=min_area)
    boxes = []
    for s in stats:
        x0, y0, x1, y1 = s["bbox"]
        w, h = s["w"], s["h"]
        if w < min_w or h < min_h or h > max_h:
            continue
        # text lines are wider than tall (generous: allow short tokens)
        if w < h * 0.6:
            continue
        # reject sparse frames (outline boxes) — text fills its bbox
        if s["area"] < 0.25 * w * h:
            continue
        boxes.append([x0, y0, x1, y1])
    # merge horizontally adjacent boxes on the same baseline row
    boxes.sort(key=lambda b: (b[1], b[0]))
    merged: List[List[int]] = []
    for b in boxes:
        if merged:
            m = merged[-1]
            same_row = abs(b[1] - m[1]) < 0.6 * (m[3] - m[1])
            close = b[0] - m[2] < 1.2 * (m[3] - m[1])
            if same_row and close and b[0] >= m[0]:
                m[2] = max(m[2], b[2])
                m[1] = min(m[1], b[1])
                m[3] = max(m[3], b[3])
                continue
        merged.append(list(b))
    merged.sort(key=lambda b: (b[1], b[0]))
    return merged


def detect_lines(rgb_batch: np.ndarray) -> List[List[List[int]]]:
    """Crop batch -> per-crop reading-ordered line boxes."""
    labels = np.asarray(line_masks(jnp.asarray(rgb_batch)))
    return [extract_line_boxes(labels[i]) for i in range(labels.shape[0])]
