"""Multi-process host data loader: detection + region rasterization.

The prepare stage (native PDF metadata -> two-pass detection -> fitted-DPI
region rasterization -> PNG encode) is host/CPU work whose Python half holds
the GIL, so threads cannot overlap it with the orchestrator's own Python.
Worker PROCESSES give true parallelism — the idiomatic TPU host input
pipeline (like a framework data loader): N workers each hold their own
native document handles and stream prepared batches to the consumer.

Workers never initialize a JAX backend: the prepare path touches only
numpy / PIL / the native engine (guarded by a test in tests/test_pipeline.py).

The pool is a module-level singleton with per-process document caches keyed
by pdf path, so consecutive pipelines (e.g. warmup then measured run) reuse
warm workers.

Replaces the reference's serial in-loop page walk
(/root/reference/pdf_image_segmentation.py:2734, 2763).
"""
from __future__ import annotations

import io as _io
import os
import threading
import zlib
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from synapta_tpu.utils.log import get_logger

log = get_logger("loader")

PreparedBatch = Tuple[list, np.ndarray, list, list, list, list]

# ---------------------------------------------------------------- canvas ring
#
# Freshly allocating the (n, canvas, canvas, 3) batch canvas costs ~0.17 s
# per 64-page super-batch on the 1-core host (np.full page-faults 38 MB
# every call). A small ring of reusable buffers amortizes that to a
# cached-page fill. The ring must be strictly larger than the pipeline's
# in-flight window (at analyze_depth=A, recognize_depth=R the pipeline
# holds A+R+2 prepared batches: one preparing, A analyzing, R
# recognizing, one enriching) — the pipeline calls ensure_canvas_ring
# with its configured depths before leasing. The vision-LLM clients
# snapshot pixels at submit time (llm/pixtral.py submit_*), so no
# consumer can observe a recycled buffer. Worker processes pickle their
# results (a copy), so per-process rings are trivially safe there.
_CANVAS_RING: List[Optional[np.ndarray]] = [None] * 6
_CANVAS_RING_I = 0
_CANVAS_LOCK = threading.Lock()


def ensure_canvas_ring(in_flight: int) -> None:
    """Grow the ring so `in_flight` leases can be alive at once (plus one
    slot of slack so the next lease never lands on a live buffer)."""
    global _CANVAS_RING
    with _CANVAS_LOCK:
        if len(_CANVAS_RING) <= in_flight:
            _CANVAS_RING = _CANVAS_RING + [None] * (
                in_flight + 1 - len(_CANVAS_RING)
            )


def _lease_canvases(n: int, canvas_size: int) -> np.ndarray:
    """Returns an (n, canvas_size, canvas_size, 3) uint8 view backed by a
    recycled ring buffer. NOT cleared: the caller pastes content into
    [:h, :w] and must white-fill only the right/bottom margins (a full
    .fill(255) page-faults ~50 MB/batch at ~0.8 GB/s on this host —
    ~1 ms/page of pure memset for bytes the paste overwrites anyway)."""
    global _CANVAS_RING_I
    with _CANVAS_LOCK:
        i = _CANVAS_RING_I
        _CANVAS_RING_I = (i + 1) % len(_CANVAS_RING)
        buf = _CANVAS_RING[i]
        if (buf is None or buf.shape[0] < n
                or buf.shape[1] != canvas_size):
            buf = np.empty((n, canvas_size, canvas_size, 3), np.uint8)
            _CANVAS_RING[i] = buf
    return buf[:n]


def prepare_batch(
    engine,
    render_doc,
    render_dpi: float,
    canvas_size: int,
    pages: Sequence[int],
    png_pool: Optional[ThreadPoolExecutor] = None,
    timers=None,
) -> Optional[PreparedBatch]:
    """Detect + rasterize one span of pages.

    Returns (regions, canvases, dims, pngs, keep, ctxs) or None when the
    span has no visual regions. ``png_pool`` (optional) overlaps the
    GIL-free zlib PNG encodes with the following renders.
    """
    from PIL import Image

    if timers is None:
        from synapta_tpu.utils.profiler import TIMERS as timers

    def encode_png(img: np.ndarray) -> bytes:
        with timers.stage("png_encode"):
            try:
                from synapta_tpu.io.ingest import png_encode

                return png_encode(img)
            except Exception:
                # native engine absent/failed: PIL fallback
                bio = _io.BytesIO()
                Image.fromarray(img).save(bio, format="PNG", compress_level=1)
                return bio.getvalue()

    regions: List[Any] = []
    rendered: List[Any] = []
    for p in pages:
        try:
            with timers.stage("detect"):
                found = engine.detect_page(p)
        except Exception:
            log.exception("detection failed on page %d", p)
            continue
        for r in found:
            regions.append(r)
            try:
                # Canvas render at fitted DPI (crisp 1px strokes — a
                # bilinear downscale of the 150-DPI render blurs thin chart
                # lines below the edge/morphology thresholds); the 150-DPI
                # render happens ONLY for oversized regions, and is then
                # reused for both the output PNG and the hires OCR tiles.
                w_pt = max(r.bbox.x1 - r.bbox.x0, 1.0)
                h_pt = max(r.bbox.y1 - r.bbox.y0, 1.0)
                dpi = min(render_dpi, 72.0 * canvas_size / max(w_pt, h_pt))
                clip = [r.bbox.x0, r.bbox.y0, r.bbox.x1, r.bbox.y1]
                with timers.stage("render"):
                    if dpi >= render_dpi - 1e-6:
                        arr = render_doc.render(
                            r.page_num, dpi=dpi, clip=clip
                        )
                        hi, ctx_val = arr, None
                    elif getattr(engine.cfg, "single_render", True):
                        # render ONCE at full DPI; the analysis canvas is
                        # a coverage-exact box downscale (same integral
                        # the rasterizer's antialiasing computes at the
                        # fitted DPI — see ingest.box_downscale)
                        from synapta_tpu.io.ingest import box_downscale

                        hi = render_doc.render(
                            r.page_num, dpi=render_dpi, clip=clip
                        )
                        # replicate the native renderer's lround dims
                        scale = dpi / 72.0
                        oh = max(1, int(h_pt * scale + 0.5))
                        ow = max(1, int(w_pt * scale + 0.5))
                        arr = box_downscale(hi, oh, ow)
                        ctx_val = (hi, render_dpi / dpi)
                    else:
                        arr = render_doc.render(
                            r.page_num, dpi=dpi, clip=clip
                        )
                        hi = render_doc.render(
                            r.page_num, dpi=render_dpi, clip=clip
                        )
                        ctx_val = (hi, render_dpi / dpi)
                png = (
                    png_pool.submit(encode_png, hi)
                    if png_pool is not None
                    else encode_png(hi)
                )
                # segment ids hash the RAW render, not the encoded PNG —
                # encoder changes must not re-id (and so duplicate on
                # resume) identical content (io/writers.segment_id_for_region).
                # crc32 over the array buffer (no tobytes copy) runs ~8x
                # faster than md5 (0.5 vs 3.9 ms/crop measured); the id
                # keeps the reference's 8-hex-char shape (ref :3783), and
                # 32 bits is exactly what md5[:8] provided.
                hi_c = (hi if hi.flags["C_CONTIGUOUS"]
                        else np.ascontiguousarray(hi))
                r.content_digest = f"{zlib.crc32(hi_c) & 0xffffffff:08x}"
                rendered.append((arr, ctx_val, png))
            except Exception as e:
                rendered.append(e)
    if not regions:
        return None

    canvases = _lease_canvases(len(regions), canvas_size)
    dims: List[tuple] = []
    pngs: List[bytes] = []
    keep: List[bool] = []
    ctxs: List[Any] = []
    for i, item in enumerate(rendered):
        try:
            if isinstance(item, Exception):
                raise item
            arr, ctx_val, png = item
            h = min(arr.shape[0], canvas_size)
            w = min(arr.shape[1], canvas_size)
            canvases[i, :h, :w] = arr[:h, :w]
            # white-fill only the uncovered margins (ring buffers are
            # recycled, so every byte outside the paste must be cleared)
            if w < canvas_size:
                canvases[i, :h, w:] = 255
            if h < canvas_size:
                canvases[i, h:] = 255
            dims.append((h, w))
            ctxs.append(ctx_val)
            # pngs may hold FUTURES (png_pool path): the consumer resolves
            # them at segment-build time, several pipeline stages later —
            # by then the encode thread has run inside the device-sync
            # waits (ctypes/zlib release the GIL), so on the 1-core host
            # the encode cost hides under tunnel latency instead of
            # serializing after the renders (resolve_pngs below).
            pngs.append(png)
            keep.append(True)
        except Exception:
            log.exception(
                "render failed for region on page %d", regions[i].page_num
            )
            canvases[i] = 255  # recycled buffer: clear stale content
            dims.append((1, 1))
            pngs.append(b"")
            keep.append(False)
            ctxs.append(None)

    return regions, canvases, dims, pngs, keep, ctxs


def resolve_pngs(pngs: List[Any]) -> List[bytes]:
    """Materialize deferred PNG encodes (futures from prepare_batch's
    png_pool path; plain bytes pass through). A failed encode resolves to
    b'' rather than poisoning the whole batch."""
    out: List[bytes] = []
    for p in pngs:
        if hasattr(p, "result"):
            try:
                p = p.result()
            except Exception:
                log.exception("deferred png encode failed")
                p = b""
        out.append(p)
    return out


# ---------------------------------------------------------------- workers

# per-WORKER-process state: {pdf_path: (engine, render_doc)} + a png pool
_DOCS: dict = {}
_PNG_POOL: Optional[ThreadPoolExecutor] = None


def _worker_prepare(pdf_path: str, det_cfg, canvas_size: int,
                    pages: Sequence[int]) -> Optional[PreparedBatch]:
    """Runs inside a loader worker process."""
    global _PNG_POOL
    from synapta_tpu.io.ingest import open_pdf
    from synapta_tpu.vision.detect import DetectionEngine

    state = _DOCS.get(pdf_path)
    if state is None:
        doc = open_pdf(pdf_path)
        render_doc = open_pdf(pdf_path)
        state = (DetectionEngine(doc, det_cfg, pixels_doc=render_doc),
                 render_doc)
        _DOCS.clear()  # one book at a time per worker; drop stale handles
        _DOCS[pdf_path] = state
    engine, render_doc = state
    engine.cfg = det_cfg
    if _PNG_POOL is None:
        _PNG_POOL = ThreadPoolExecutor(max_workers=2,
                                       thread_name_prefix="png")
    pb = prepare_batch(
        engine, render_doc, det_cfg.render_dpi, canvas_size, list(pages),
        png_pool=_PNG_POOL,
    )
    if pb is None:
        return None
    # futures cannot pickle across the process boundary — and a worker
    # has its own core, so there is no device wait to hide them under
    regions, canvases, dims, pngs, keep, ctxs = pb
    return regions, canvases, dims, resolve_pngs(pngs), keep, ctxs


_POOL: Optional[ProcessPoolExecutor] = None
_POOL_WORKERS = 0


def loader_pool(workers: int) -> ProcessPoolExecutor:
    """Module-level worker pool (spawn context: must never inherit an
    initialized device backend). Kept alive across pipeline instances so
    warm workers (imports + doc caches) amortize."""
    global _POOL, _POOL_WORKERS
    if _POOL is None or _POOL_WORKERS < workers:
        if _POOL is not None:
            _POOL.shutdown(wait=False)
        import multiprocessing as mp

        _POOL = ProcessPoolExecutor(
            max_workers=workers, mp_context=mp.get_context("spawn")
        )
        _POOL_WORKERS = workers
    return _POOL


class PrepareLoader:
    """Streams prepared batches for one document.

    workers > 0: spans fan out to the process pool (true CPU parallelism).
    workers == 0: in-process fallback (used by tests and tiny runs) — the
    caller's prefetch thread runs prepare_batch directly.
    """

    def __init__(self, pdf_path: str, det_cfg, canvas_size: int,
                 workers: int = 0, engine=None, render_doc=None,
                 png_pool=None):
        self.pdf_path = pdf_path
        self.det_cfg = det_cfg
        self.canvas_size = canvas_size
        self.workers = max(0, int(workers))
        self._engine = engine
        self._render_doc = render_doc
        self._png_pool = png_pool

    def submit(self, pool_fallback, pages: Sequence[int]):
        """Returns a future for one span. ``pool_fallback``: the caller's
        thread pool used when workers == 0."""
        if self.workers:
            return loader_pool(self.workers).submit(
                _worker_prepare, self.pdf_path, self.det_cfg,
                self.canvas_size, list(pages),
            )
        return pool_fallback.submit(
            prepare_batch, self._engine, self._render_doc,
            self.det_cfg.render_dpi, self.canvas_size, list(pages),
            self._png_pool,
        )
