"""Batched on-TPU OCR driver — the PaddleOCR replacement.

Mirrors the reference OCRProcessor surface (ref
pdf_image_segmentation.py:1082-1195) but operates on whole crop *batches*:
device-side line detection (linedet), height-normalized line tiles batched
through the CTC recognizer in fixed-shape chunks, greedy decode, then the
chart/diagram enrichment fields. Emits the exact OCRResult schema: blocks
with pixel AABBs and 0-100 confidences, 0-1 mean confidence
(ref :1144-1195).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from synapta_tpu.config import OCRConfig
from synapta_tpu.models.charset import BLANK, decode_greedy
from synapta_tpu.models.recognizer import Recognizer
from synapta_tpu.ocr import heuristics as H
from synapta_tpu.ocr.linedet import detect_lines
from synapta_tpu.schema import OCRResult


class TPUOCR:
    """Loads recognizer weights once; recognizes line batches on device."""

    def __init__(self, cfg: OCRConfig = OCRConfig(),
                 weights_path: Optional[str] = None, mesh=None):
        from synapta_tpu.models.train import WEIGHTS_PATH, load_params

        self.cfg = cfg
        path = weights_path or WEIGHTS_PATH
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"recognizer weights missing at {path} — run "
                "`python -m synapta_tpu.models.train`"
            )
        self.params = load_params(path)
        self.model = Recognizer()
        # line detection backend: "heuristic" (ink morphology, exact on
        # clean renders), "db" (trainable DB-style model,
        # models/detector.py — the PaddleOCR-DBNet parity path for
        # degraded/scanned inputs), or "auto" (heuristic except crops
        # flagged scanned-like by the caller via db_mask)
        self._db_detector = None
        self._det_mode = getattr(cfg, "line_detector", "auto")
        if self._det_mode == "db":
            self._db_detector = self.db_detector

        def _decode(p, x):
            # tiles arrive uint8 (4x less tunnel H2D than f32); normalize
            # on device
            x = x.astype(jnp.float32) / 255.0
            logits = self.model.apply({"params": p}, x)
            best = jnp.argmax(logits, axis=-1)
            conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
            # pack into one f32 array -> ONE D2H transfer per batch
            return jnp.concatenate(
                [best.astype(jnp.float32)[..., None], conf[..., None]], axis=-1
            )

        if mesh is not None:
            # DP over text-line batches: params replicated, tiles sharded
            # across the mesh's 'data' axis (line_batch must divide evenly —
            # recognize_tiles pads every chunk to cfg.line_batch)
            from synapta_tpu.parallel.mesh import data_sharded, replicated

            rep = jax.tree.map(lambda _: replicated(mesh), self.params)
            # params live on device ONCE — host numpy args would re-pay
            # the ~5MB weight transfer on every dispatch (tunnel ~30MB/s)
            self.params = jax.device_put(self.params, replicated(mesh))
            self._decode = jax.jit(
                _decode,
                in_shardings=(rep, data_sharded(mesh)),
                out_shardings=data_sharded(mesh),
            )
        else:
            self.params = jax.device_put(self.params)
            self._decode = jax.jit(_decode)

    # ---------------------------------------------------------------- lines

    @property
    def db_detector(self):
        """Lazily-bound DB line detector (process-wide singleton: the
        weights and the jitted boxes program load once)."""
        if self._db_detector is None:
            from synapta_tpu.models.detector import get_line_detector

            self._db_detector = get_line_detector(
                det_size=self.cfg.crop_size)
        return self._db_detector

    def _line_tile(self, crop: np.ndarray, box: List[int],
                   ctx=None) -> np.ndarray:
        """Normalize one text line to a (32, W) uint8 tile.

        ``ctx`` may carry (hires_image, px_ratio): the 150-DPI render of the
        same region (already produced for the output PNG). Cutting tiles
        from it recovers small text that the device-canvas downscale blurs,
        with zero re-render or alignment risk.
        """
        from PIL import Image

        cfg = self.cfg
        target_h = cfg.line_height - 4
        x0, y0, x1, y1 = box
        src = crop
        if ctx is not None:
            hires, ratio = ctx
            if hires is not None and ratio > 1.001:
                src = hires
                x0 = int(x0 * ratio)
                y0 = int(y0 * ratio)
                x1 = int(np.ceil(x1 * ratio))
                y1 = int(np.ceil(y1 * ratio))
        pad = 2
        yy0 = max(0, y0 - pad)
        xx0 = max(0, x0 - pad)
        # clamp ends non-negative too: a fully-off-image box must yield an
        # EMPTY slice (white tile), not wrap around via numpy's negative
        # indexing (native spdf_line_tiles parity)
        yy1 = max(0, min(src.shape[0], y1 + pad))
        xx1 = max(0, min(src.shape[1], x1 + pad))
        sub = src[yy0:yy1, xx0:xx1]
        if sub.size == 0:
            sub = np.full((8, 8, 3), 255, np.uint8)
        # integer luma (ITU-R 601 in 8.8 fixed point): the float path made
        # float64 temporaries per tile and showed up in ocr_tile_prep
        s16 = sub.astype(np.uint16)
        gray = (
            (77 * s16[..., 0] + 150 * s16[..., 1] + 29 * s16[..., 2]) >> 8
        ).astype(np.uint8)
        # contrast-normalize: scanned/photographed sources have grey
        # backgrounds and compressed ink range (the recognizer trains on
        # clean white renders); stretch the 1-99 percentile span to full
        # range. Identity-ish on clean tiles (bg 255, ink ~0 already).
        # Percentiles via the 256-bin histogram: np.percentile sorts the
        # whole tile (~2ms each at hires) — the histogram is ~10x cheaper.
        cum = np.cumsum(np.bincount(gray.ravel(), minlength=256))
        n_px = cum[-1]
        lo = float(np.searchsorted(cum, 0.01 * n_px))
        hi = float(np.searchsorted(cum, 0.99 * n_px))
        if hi - lo > 30.0:
            gray = np.clip(
                (gray.astype(np.float32) - lo) * (255.0 / (hi - lo)),
                0.0, 255.0,
            ).astype(np.uint8)
        h, w = gray.shape
        scale_t = target_h / max(h, 1)
        new_w = max(1, min(int(w * scale_t), cfg.line_max_width))
        img = Image.fromarray(gray).resize((new_w, target_h), Image.BILINEAR)
        tile = np.full((cfg.line_height, cfg.line_max_width), 255, np.uint8)
        tile[2 : 2 + target_h, :new_w] = np.asarray(img)
        return tile

    def recognize_tiles(self, tiles: np.ndarray) -> List[Dict]:
        """(N, 32, W) uint8 (or [0,1] float) tiles -> [{'text', 'confidence'
        0-100}] via fixed-shape device batches. Tiles cross to the device as
        uint8 and normalize there."""
        cfg = self.cfg
        if tiles.dtype != np.uint8:
            tiles = np.clip(tiles * 255.0, 0.0, 255.0).astype(np.uint8)
        return self.recognize_sync(self.recognize_dispatch(tiles))

    def recognize_dispatch(self, tiles: np.ndarray):
        """Async half: enqueue every fixed-shape batch (dispatch-all — the
        tunnel overlaps batch N+1's H2D with batch N's compute) and return
        the pending device handles without materializing."""
        cfg = self.cfg
        if tiles.dtype != np.uint8:
            tiles = np.clip(tiles * 255.0, 0.0, 255.0).astype(np.uint8)
        n = tiles.shape[0]
        pending = []
        for start in range(0, n, cfg.line_batch):
            chunk = tiles[start : start + cfg.line_batch]
            pad_n = cfg.line_batch - chunk.shape[0]
            if pad_n:
                chunk = np.concatenate(
                    [chunk, np.full((pad_n,) + chunk.shape[1:], 255, np.uint8)]
                )
            pending.append(
                (self._decode(self.params, chunk[..., None]), chunk.shape[0], pad_n)
            )
        return pending

    @staticmethod
    def recognize_sync(pending) -> List[Dict]:
        """Host half: materialize dispatched batches and CTC-decode
        (batched numpy decode — the per-tile Python loop was ~2s/book)."""
        from synapta_tpu.models.charset import decode_greedy_batch

        # start every D2H copy before materializing any: the tunnel charges
        # ~50ms latency per round trip, so serial np.asarray pulls pay it
        # once per chunk while async copies pay it once per super-batch
        for dev_packed, _, _ in pending:
            try:
                dev_packed.copy_to_host_async()
            except AttributeError:
                break
        out: List[Dict] = []
        for dev_packed, chunk_n, pad_n in pending:
            packed = np.asarray(dev_packed)
            n = chunk_n - pad_n
            best = packed[:n, :, 0].astype(np.int32)
            conf = packed[:n, :, 1]
            texts = decode_greedy_batch(best)
            nonblank = best != BLANK
            counts = nonblank.sum(axis=1)
            sums = np.where(nonblank, conf, 0.0).sum(axis=1)
            means = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
            out.extend(
                {"text": t, "confidence": float(c) * 100.0}
                for t, c in zip(texts, means)
            )
        return out

    # ---------------------------------------------------------------- crops

    def collect_tiles(
        self,
        crops: np.ndarray,
        render_ctx: Optional[Sequence] = None,
        line_boxes=None,
        db_mask: Optional[Sequence[bool]] = None,
        db_override: Optional[Dict[int, list]] = None,
    ):
        """Cut + normalize every text-line tile for one crop batch.

        ``db_mask``: per-crop flags from the caller marking scanned-like
        crops; in "auto"/"db" mode those crops re-detect through the
        trainable DB model, overriding the fused heuristic boxes.
        ``db_override``: {crop_idx: boxes} precomputed by the caller (the
        pipeline batches ONE DB dispatch per super-batch) — takes
        precedence over db_mask, no device work here.

        Returns (tiles list, owners list, boxes list) — the host-side half
        of recognition, separable so callers can POOL tiles from several
        batches into fuller fixed-shape device dispatches."""
        if line_boxes is not None:
            from synapta_tpu.ocr.linedet import extract_line_boxes

            per_crop_boxes = [
                extract_line_boxes(line_boxes[i]) for i in range(crops.shape[0])
            ]
        else:
            per_crop_boxes = (
                detect_lines(crops) if self._det_mode != "db"
                else self.db_detector.detect_lines(crops, hires=render_ctx)
            )
        if db_override:
            for i, boxes in db_override.items():
                if boxes and i < len(per_crop_boxes):
                    per_crop_boxes[i] = boxes
        elif (
            db_mask is not None
            and self._det_mode in ("auto", "db")
            and any(db_mask)
        ):
            idx = [i for i, m in enumerate(db_mask) if m and i < crops.shape[0]]
            if idx:
                db_boxes = self.db_detector.detect_lines(
                    crops[np.array(idx)],
                    hires=(
                        [render_ctx[i] for i in idx]
                        if render_ctx is not None else None
                    ),
                )
                for j, i in enumerate(idx):
                    if db_boxes[j]:  # keep heuristic boxes on a dry miss
                        per_crop_boxes[i] = db_boxes[j]
        from synapta_tpu.utils.profiler import TIMERS

        tiles, owners, boxes_flat, parts = [], [], [], []
        with TIMERS.stage("ocr_tile_prep"):
            for ci, boxes in enumerate(per_crop_boxes):
                ctx = render_ctx[ci] if render_ctx is not None else None
                segs_crop: List[List[int]] = []
                for b in boxes:
                    segs, joins = self._split_long_line(crops[ci], b)
                    segs_crop.extend(segs)
                    owners.append(ci)
                    boxes_flat.append(b)
                    parts.append((len(segs), joins))
                tiles.extend(self._crop_tiles(crops[ci], segs_crop, ctx))
        return tiles, owners, boxes_flat, parts

    def _crop_tiles(self, crop: np.ndarray, segs: List[List[int]],
                    ctx=None) -> List[np.ndarray]:
        """All line tiles of one crop in a single native batched call
        (io/ingest.line_tiles_native — bit-identical to _line_tile, which
        stays as the .so-absent fallback). The per-tile Python+PIL loop
        profiled at ~1.4 ms/tile on the 1-core host; the native batch
        runs at ~0.05 ms/tile."""
        if not segs:
            return []
        cfg = self.cfg
        src = crop
        ratio = 1.0
        if ctx is not None:
            hires, r = ctx
            if hires is not None and r > 1.001:
                src, ratio = hires, r
        boxes = np.empty((len(segs), 4), np.int32)
        for i, (x0, y0, x1, y1) in enumerate(segs):
            if ratio > 1.001:
                # same coordinate scaling _line_tile applies (truncate
                # mins, ceil maxes)
                boxes[i] = (int(x0 * ratio), int(y0 * ratio),
                            int(np.ceil(x1 * ratio)),
                            int(np.ceil(y1 * ratio)))
            else:
                boxes[i] = (int(x0), int(y0), int(x1), int(y1))
        try:
            from synapta_tpu.io.ingest import line_tiles_native

            res = line_tiles_native(
                src, boxes, cfg.line_height, cfg.line_max_width
            )
        except Exception:
            res = None
        if res is None:  # native engine absent: per-tile Python path
            # boxes already scaled -> pass src-space boxes with no ctx
            return [self._line_tile(src, list(b), None) for b in boxes]
        tiles_arr, _cw = res
        return list(tiles_arr)

    def _split_long_line(self, crop: np.ndarray, box) -> List[List[int]]:
        """Split a line box that would squash more than cfg.split_squash
        against the recognizer tile (384/28 ≈ 13.7 aspect) into parts at
        WHITESPACE valleys. The CTC head emits W/4 frames, so squash
        directly eats frames-per-character: at 2x a dense 74-char line
        decodes only ~40 chars before the frames run out (measured on the
        scanned fixture). Parts re-join after decoding; true word-gap cuts
        re-join with a space, forced mid-glyph cuts concatenate."""
        cfg = self.cfg
        x0, y0, x1, y1 = (int(v) for v in box)
        h = max(y1 - y0, 1)
        tile_aspect = (cfg.line_max_width - 8) / float(cfg.line_height - 4)
        if (x1 - x0) / h <= cfg.split_squash * tile_aspect:
            return [list(box)], []
        # size parts to fill the tile roughly unsquashed
        n = int(np.ceil((x1 - x0) / (h * tile_aspect)))
        # ink column profile inside the box (canvas space)
        sub = crop[max(0, y0):y1, max(0, x0):x1]
        gray = sub.mean(axis=-1) if sub.ndim == 3 else sub
        col_ink = (gray < 200).sum(axis=0)
        span = (x1 - x0) / n
        cuts = [x0]
        joins: List[str] = []
        for k in range(1, n):
            target = int(k * span)
            # wide search window: a forced mid-glyph cut slices a letter
            # in half and BOTH parts drop it, so finding a true zero-ink
            # gap matters far more than cutting exactly at the target
            # (the recognizer tolerates up to ~2x squash / short parts)
            lo = max(0, target - int(span * 0.4))
            hi = min(len(col_ink), target + int(span * 0.4))
            if hi <= lo:
                cuts.append(x0 + target)
                joins.append("")
                continue
            window = col_ink[lo:hi]
            # prefer the CENTER of the widest zero-ink run (cleanest cut);
            # fall back to the global minimum when no column is empty
            zero = window == 0
            best_run = (0, 0)  # (width, start)
            run = 0
            for idx in range(len(zero) + 1):
                if idx < len(zero) and zero[idx]:
                    run += 1
                else:
                    if run > best_run[0]:
                        best_run = (run, idx - run)
                    run = 0
            if best_run[0] > 0:
                gap_w, gstart = best_run
                best = gstart + gap_w // 2
                # a TRUE word gap re-joins with a space; inter-LETTER gaps
                # also reach zero ink at low canvas DPI, so the
                # discriminator is gap WIDTH: word gaps span >= ~0.3 of
                # the line height, letter gaps 1-2px
                joins.append(" " if gap_w >= max(2, int(0.3 * h)) else "")
            else:
                best = int(np.argmin(window))
                joins.append("")
            cuts.append(x0 + lo + best)
        cuts.append(x1)
        segs, kept_joins = [], []
        for i in range(n):
            if cuts[i + 1] > cuts[i]:
                segs.append([cuts[i], y0, cuts[i + 1], y1])
                if i < n - 1:
                    kept_joins.append(joins[i])
        return segs, kept_joins[: max(len(segs) - 1, 0)]

    @staticmethod
    def merge_parts(owners, boxes_flat, parts, recs):
        """Fold multi-part line decodes back into one rec per line box.
        Parts cut at true word gaps re-join with a space; forced mid-word
        cuts concatenate directly. Confidence = mean of non-empty parts."""
        out_recs: List[Dict] = []
        i = 0
        for n, joins in parts:
            chunk = recs[i:i + n]
            i += n
            if n == 1:
                out_recs.append(chunk[0])
                continue
            text = chunk[0]["text"].strip()
            for k in range(1, n):
                j = joins[k - 1] if k - 1 < len(joins) else " "
                text += j + chunk[k]["text"].strip()
            confs = [c["confidence"] for c in chunk if c["text"].strip()]
            out_recs.append(
                {
                    "text": text,
                    "confidence": float(np.mean(confs)) if confs else 0.0,
                }
            )
        return out_recs

    @staticmethod
    def gate_blocks(n_crops: int, owners, boxes_flat, recs) -> List[List[Dict]]:
        """Confidence-gate recognized lines into per-crop block lists."""
        results: List[List[Dict]] = [[] for _ in range(n_crops)]
        for owner, box, rec in zip(owners, boxes_flat, recs):
            if not rec["text"].strip():
                continue
            # drop low-confidence junk (arrowheads, stroke fragments) —
            # the reference's PaddleOCR applied its own rec-score gate.
            # Very short decodes must be near-certain: crisp digits
            # score ~99; stroke fragments decode in the 55-85 band.
            # Exception: letter+digit tokens ('Q1', 'H2') are axis-tick
            # shapes no stroke fragment ever decodes to, and tick glyphs
            # are tiny/blurred so their trained confidence tops out ~70-95
            # — they get the ordinary gate.
            text = rec["text"].strip()
            ticky = (
                len(text) == 2 and text[0].isalpha() and text[1].isdigit()
            )
            min_conf = 82.0 if (len(text) <= 2 and not ticky) else 55.0
            if rec["confidence"] < min_conf:
                continue
            results[owner].append(
                {
                    "text": rec["text"],
                    "bbox": [int(v) for v in box],
                    "confidence": rec["confidence"],
                }
            )
        return results

    def assemble_results(
        self,
        n_crops: int,
        results: List[List[Dict]],
        crops_shape,
        arrows: Optional[Sequence[int]] = None,
        sizes: Optional[Sequence[tuple]] = None,
    ) -> List[OCRResult]:
        """Per-crop gated blocks -> OCRResult records (ref :1144-1195)."""
        out: List[OCRResult] = []
        for ci in range(n_crops):
            blocks = results[ci]
            raw_text = "\n".join(b["text"] for b in blocks)
            mean_conf = (
                float(np.mean([b["confidence"] for b in blocks])) / 100.0
                if blocks
                else 0.0
            )
            size = (
                (sizes[ci][1], sizes[ci][0])
                if sizes is not None
                else (crops_shape[2], crops_shape[1])
            )
            ocr = OCRResult(
                raw_text=raw_text,
                blocks=blocks,
                confidence=mean_conf,
                axis_labels=H.detect_axis_labels(raw_text),
                legend_items=H.detect_legend_advanced(
                    OCRResult(raw_text=raw_text, blocks=blocks), size
                ),
                tick_labels=H.extract_tick_labels(
                    OCRResult(raw_text=raw_text, blocks=blocks)
                ),
                node_texts=H.node_texts(blocks),
                detected_arrows=int(arrows[ci]) if arrows is not None else 0,
            )
            out.append(ocr)
        return out

    def process_group(self, items: List[dict]) -> List[List[OCRResult]]:
        """Pooled recognition over SEVERAL crop batches: tiles from every
        batch concatenate into one tile stream so device dispatches stay
        full (the per-dispatch tunnel overhead dominates small batches).

        ``items``: [{'crops', 'sizes', 'render_ctx', 'line_boxes'}].
        Returns one List[OCRResult] per item."""
        return self.group_sync(self.group_dispatch(items))

    def group_dispatch(self, items: List[dict], submit=None):
        """Async half of process_group: cut tiles (host) + enqueue the
        recognition batches (device) without materializing. The returned
        state goes to group_sync — callers interleave other host work in
        between while the device computes.

        ``submit``: optional executor.submit-style hook; when given, the
        (GIL-releasing but blocking) H2D + enqueue runs on that executor
        and group_sync resolves the future."""
        all_tiles, spans = [], []
        metas = []
        for it in items:
            tiles, owners, boxes_flat, parts = self.collect_tiles(
                it["crops"], it.get("render_ctx"), it.get("line_boxes"),
                it.get("db_mask"), it.get("db_override"),
            )
            spans.append((len(all_tiles), len(all_tiles) + len(tiles)))
            all_tiles.extend(tiles)
            metas.append((owners, boxes_flat, parts))
        pending = None
        if all_tiles:
            stacked = np.stack(all_tiles)
            pending = (
                submit(self.recognize_dispatch, stacked)
                if submit is not None
                else self.recognize_dispatch(stacked)
            )
        return items, spans, metas, pending

    def group_sync(self, state) -> List[List[OCRResult]]:
        """Host half: materialize recognition, gate, assemble OCRResults."""
        from synapta_tpu.utils.profiler import TIMERS

        items, spans, metas, pending = state
        if pending is not None and hasattr(pending, "result"):
            pending = pending.result()
        recs_all: List[Dict] = []
        if pending is not None:
            with TIMERS.stage("ocr_recognize"):
                recs_all = self.recognize_sync(pending)
        out: List[List[OCRResult]] = []
        for it, (lo, hi), (owners, boxes_flat, parts) in zip(items, spans, metas):
            n = it["crops"].shape[0]
            merged = self.merge_parts(owners, boxes_flat, parts, recs_all[lo:hi])
            results = self.gate_blocks(n, owners, boxes_flat, merged)
            out.append(
                self.assemble_results(
                    n, results, it["crops"].shape,
                    arrows=it.get("arrows"), sizes=it.get("sizes"),
                )
            )
        return out

    # ---------------------------------------------------------------- crops

    def process_batch(
        self,
        crops: np.ndarray,
        arrows: Optional[Sequence[int]] = None,
        sizes: Optional[Sequence[tuple]] = None,
        render_ctx: Optional[Sequence] = None,
        line_boxes=None,
        db_mask: Optional[Sequence[bool]] = None,
    ) -> List[OCRResult]:
        """(B, H, W, 3) uint8 crop batch -> one OCRResult per crop.

        ``arrows``: per-crop arrow counts from the feature pass (the
        reference computed them inside OCR enrichment, ref :1185).
        ``sizes``: true (h, w) of each crop before padding.
        ``render_ctx``: optional per-crop (hires_image, ratio) pairs for
        native-resolution line tiles.
        ``line_boxes``: optional (B, K, 5) device box tensor from the fused
        analysis pass — skips the separate line-detection dispatch.
        ``db_mask``: per-crop scanned-like flags (DB detector override).
        """
        from synapta_tpu.utils.profiler import TIMERS

        tiles, owners, boxes_flat, parts = self.collect_tiles(
            crops, render_ctx, line_boxes, db_mask
        )
        recs: List[Dict] = []
        if tiles:
            with TIMERS.stage("ocr_recognize"):
                recs = self.merge_parts(
                    owners, boxes_flat, parts,
                    self.recognize_tiles(np.stack(tiles)),
                )
        results = self.gate_blocks(crops.shape[0], owners, boxes_flat, recs)
        return self.assemble_results(
            crops.shape[0], results, crops.shape, arrows=arrows, sizes=sizes
        )
