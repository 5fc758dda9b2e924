"""Trainable DB-style detector (models/detector.py): target geometry,
loss sanity, and — once weights exist — box recall/IoU on synthetic pages
vs the known text-line truth (the parity surface SURVEY §2.3's
"JAX DBNet detector" row requires)."""
import os

import numpy as np
import pytest

from synapta_tpu.models.detector import (
    DET_WEIGHTS_PATH,
    DBLineDetector,
    make_det_batch,
    render_det_page,
    shrink_box,
    unshrink_boxes,
)

needs_det_weights = pytest.mark.skipif(
    not os.path.exists(DET_WEIGHTS_PATH), reason="detector not trained"
)


def test_shrink_unshrink_roundtrip():
    x0, y0, x1, y1 = 10.0, 20.0, 210.0, 40.0
    s = shrink_box(x0, y0, x1, y1)
    assert x0 < s[0] < s[2] < x1 and y0 < s[1] < s[3] < y1
    un = unshrink_boxes(np.array([s], np.float32))[0]
    # unshrink recovers the original box within a couple of pixels
    assert abs(un[0] - x0) < 3 and abs(un[1] - y0) < 3
    assert abs(un[2] - x1) < 3 and abs(un[3] - y1) < 3


def test_det_batch_targets():
    rng = np.random.default_rng(1)
    imgs, prob_t, band, thr_t = make_det_batch(rng, batch=2)
    assert imgs.shape == (2, 512, 512, 1)
    assert prob_t.shape == (2, 256, 256)
    # positives exist and sit inside the border band
    assert prob_t.sum() > 0
    assert float((band >= prob_t).min()) == 1.0
    # threshold target: 0.3 inside text, 0.7 at borders, 0 elsewhere
    uniq = set(np.round(np.unique(thr_t).astype(np.float64), 2))
    assert uniq.issubset({0.0, 0.3, 0.7}), uniq


def test_db_loss_decreases_on_perfect_prediction():
    import jax.numpy as jnp

    from synapta_tpu.models.detector import Detector, db_loss

    rng = np.random.default_rng(2)
    imgs, prob_t, band, thr_t = make_det_batch(rng, batch=1, size=128)
    model = Detector()
    import jax

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
    loss = db_loss(params, model, jnp.asarray(imgs), jnp.asarray(prob_t),
                   jnp.asarray(band), jnp.asarray(thr_t))
    assert np.isfinite(float(loss)) and float(loss) > 0


def _recall_iou(pred, truth, iou_thresh=0.3):
    hit = 0
    for t in truth:
        best = 0.0
        for p in pred:
            ix0, iy0 = max(t[0], p[0]), max(t[1], p[1])
            ix1, iy1 = min(t[2], p[2]), min(t[3], p[3])
            inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
            a = (t[2] - t[0]) * (t[3] - t[1]) + (p[2] - p[0]) * (
                p[3] - p[1]
            ) - inter
            best = max(best, inter / a if a > 0 else 0.0)
        hit += best >= iou_thresh
    return hit / max(len(truth), 1)


@needs_det_weights
def test_db_backend_through_processor():
    """OCRConfig.line_detector='db' drives the full process_batch path."""
    from synapta_tpu.config import OCRConfig
    from synapta_tpu.models.train import WEIGHTS_PATH
    from synapta_tpu.ocr.processor import TPUOCR

    if not os.path.exists(WEIGHTS_PATH):
        pytest.skip("recognizer weights not trained")
    rng = np.random.default_rng(5)
    canvas, truth = render_det_page(rng, 512)
    rgb = np.repeat((canvas[..., None] * 255).astype(np.uint8), 3, -1)[None]
    ocr = TPUOCR(OCRConfig(line_detector="db"))
    out = ocr.process_batch(rgb)
    assert len(out) == 1
    assert out[0].blocks, "db backend found no text on a text-full page"
    assert out[0].confidence > 0.3


@needs_det_weights
def test_trained_detector_finds_lines():
    """VERDICT r3 item 1b bar: recall >= 0.9 at IoU 0.5 (was 0.8 @ 0.3,
    'far below the repo's parity standard') over mixed sparse/dense
    degraded synthetic pages."""
    rng = np.random.default_rng(3)
    det = DBLineDetector()
    recalls = []
    for _ in range(6):
        canvas, truth = render_det_page(rng, 512)
        rgb = np.repeat(
            (canvas[..., None] * 255).astype(np.uint8), 3, axis=-1
        )[None]
        pred = det.detect_lines(rgb)[0]
        # truth boxes big enough to be text lines (same floor the
        # heuristic path applies)
        truth_px = [
            t for t in truth
            if (t[2] - t[0]) >= 6 and 5 <= (t[3] - t[1]) <= 64
        ]
        recalls.append(_recall_iou(pred, truth_px, iou_thresh=0.5))
    assert float(np.mean(recalls)) >= 0.9, recalls


@needs_det_weights
def test_db_routes_scanned_fixture():
    """The production 'auto' routing sends scanned-like crops through
    the DB detector and holds the scanned CER bar (VERDICT r3 item 1b:
    'scanned eval runs through the DB detector')."""
    from synapta_tpu.config import PipelineConfig
    from synapta_tpu.models.train import WEIGHTS_PATH

    if not os.path.exists(WEIGHTS_PATH):
        pytest.skip("recognizer weights not trained")
    import tempfile

    from synapta_tpu.eval import norm_text
    from synapta_tpu.io.pdf_writer import make_scanned_book
    from synapta_tpu.llm.fake import DisabledClient
    from synapta_tpu.models.train import cer
    from synapta_tpu.pipeline import VisualSegmentationPipeline

    tmp = tempfile.mkdtemp(prefix="synapta_dbroute_")
    pdf = os.path.join(tmp, "scan.pdf")
    truths, expected = make_scanned_book(pdf, pages=1, seed=2)
    cfg = PipelineConfig(use_vision_llm=False)
    assert cfg.ocr.line_detector == "auto"  # the production default
    pipe = VisualSegmentationPipeline(
        book_id="dbroute", pdf_path=pdf,
        output_dir=os.path.join(tmp, "out"), use_mermaid=False,
        config=cfg, llm_client=DisabledClient(), resume=False,
    )
    segs = pipe.process()
    # the scanned crop must have been flagged for DB routing...
    assert pipe.ocr._db_detector is not None, "DB detector never selected"
    # ...and the CER bar holds through it
    s = next(s for s in segs if s.page_no == 1)
    hyp = norm_text(s.ocr_result.raw_text.replace("\n", " "))
    ref = norm_text(expected[0].replace("\n", " "))
    # r5 descender-plateau snap + ink-gap bridge merge: measured CER
    # 0.002-0.008 across seeds; bar at 0.025 absorbs checkpoint drift
    # (VERDICT r4 item 5 tightened this from the loose 0.05)
    assert cer(ref, hyp) <= 0.025


def test_refine_merges_row_fragments():
    """Two fragments of one text row merge into a single line box; the
    adjacent row stays separate (models/detector.refine_line_boxes)."""
    from synapta_tpu.models.detector import refine_line_boxes

    gray = np.full((64, 200), 255, np.uint8)
    # row 1: ink spanning x 10..90 and 100..170 at y 10..20 (word gap 10px)
    gray[10:20, 10:90] = 0
    gray[10:20, 100:170] = 0
    # row 2: y 30..40
    gray[30:40, 10:170] = 0
    frags = [[10, 10, 88, 20], [101, 10, 170, 20], [10, 30, 170, 40]]
    out = refine_line_boxes(gray, frags)
    assert len(out) == 2, out
    top = min(out, key=lambda b: b[1])
    bot = max(out, key=lambda b: b[1])
    # merged row covers both fragments' ink
    assert top[0] <= 10 and top[2] >= 170 and top[3] <= 25, out
    assert bot[1] >= 28, out


def test_refine_snap_recovers_clipped_chars_and_aa_tail():
    """A box that clips the last characters extends over sub-word-gap ink
    runs; antialiased edge rows (decreasing tails) stay inside the box."""
    from synapta_tpu.models.detector import refine_line_boxes

    gray = np.full((40, 160), 255, np.uint8)
    gray[12:20, 10:120] = 0          # solid line ink x 10..120
    gray[11, 10:120] = 100           # AA top row (faint)
    gray[20, 10:120] = 100           # AA bottom row
    out = refine_line_boxes(gray, [[10, 12, 106, 20]])  # clipped at x=106
    assert len(out) == 1
    b = out[0]
    assert b[2] >= 119, b            # recovered the clipped tail
    assert b[1] <= 11 and b[3] >= 21, b  # AA rows included


def test_refine_does_not_bridge_ringing_gap():
    """JPEG-ringing speckle between two tightly-leaded rows must not fuse
    them vertically (the golden-crop failure mode)."""
    from synapta_tpu.models.detector import refine_line_boxes

    gray = np.full((40, 120), 255, np.uint8)
    gray[8:16, 10:110] = 0           # row A
    gray[22:30, 10:110] = 0          # row B
    gray[17, 20:100:7] = 120         # ringing speckle in the gap
    gray[19, 14:104:9] = 130
    out = refine_line_boxes(gray, [[10, 8, 110, 16], [10, 22, 110, 30]])
    assert len(out) == 2, out
    assert all(b[3] - b[1] <= 14 for b in out), out


def test_refine_snap_keeps_plateau_descenders():
    """Descender stems are constant-width, so the row-ink profile
    PLATEAUS below the baseline (4,4,3,3,0). The snap must keep walking
    through that flat low tail — clipping it turns y into v and p into o
    (the dominant scanned-fixture error class before the fix)."""
    from synapta_tpu.models.detector import refine_line_boxes

    gray = np.full((40, 160), 255, np.uint8)
    gray[10:20, 10:150] = 0            # x-height band
    # two descender stems: constant 3px-wide columns from baseline down
    # (~0.3 line heights deep, the y/p/g descender geometry)
    for x0 in (40, 90):
        gray[20:24, x0:x0 + 3] = 0
    out = refine_line_boxes(gray, [[10, 10, 150, 20]])  # clipped at baseline
    assert len(out) == 1
    assert out[0][3] >= 24, out        # descender rows recovered


def test_refine_bridges_gap_with_missed_ink():
    """When the probability map fades mid-line, whole words between two
    fragments are never boxed; the gap band still carries their ink, so
    the fragments must merge and recognition reads the full row. A blank
    gap (true column gutter) stays split."""
    from synapta_tpu.models.detector import refine_line_boxes

    gray = np.full((40, 300), 255, np.uint8)
    gray[10:18, 10:100] = 0            # fragment A ink
    gray[10:18, 130:180] = 0           # MISSED word ink in the gap
    gray[10:18, 210:290] = 0           # fragment B ink
    out = refine_line_boxes(gray, [[10, 10, 100, 18], [210, 10, 290, 18]])
    assert len(out) == 1, out          # bridged across the missed word
    assert out[0][0] <= 10 and out[0][2] >= 289, out

    blank = np.full((40, 300), 255, np.uint8)
    blank[10:18, 10:100] = 0
    blank[10:18, 210:290] = 0          # same fragments, EMPTY gap
    out2 = refine_line_boxes(blank, [[10, 10, 100, 18], [210, 10, 290, 18]])
    assert len(out2) == 2, out2        # gutter respected
