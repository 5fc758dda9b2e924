"""The vision-LLM must never sit on the pipeline's critical path
(SURVEY.md §7 hard part 6): segments complete with heuristic analysis and
are patched via writer.update() when responses land."""
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from synapta_tpu.config import PipelineConfig
from synapta_tpu.io.pdf_writer import make_test_book
from synapta_tpu.llm.fake import FakePixtralClient
from synapta_tpu.models.train import WEIGHTS_PATH
from synapta_tpu.ocr.processor import TPUOCR
from synapta_tpu.pipeline import VisualSegmentationPipeline

needs_weights = pytest.mark.skipif(
    not os.path.exists(WEIGHTS_PATH),
    reason="recognizer weights not trained yet",
)


class DelayedFakeClient(FakePixtralClient):
    """FakePixtralClient whose futures resolve after a real delay on a
    thread pool — models api.mistral.ai latency."""

    def __init__(self, delay: float, **kw):
        super().__init__(**kw)
        self.delay = delay
        self._pool = ThreadPoolExecutor(max_workers=16)

    def _delayed(self, fn, *args):
        def work():
            time.sleep(self.delay)
            return fn(*args)

        return self._pool.submit(work)

    def submit_comprehensive(self, pixels, ocr):
        return self._delayed(self.analyze_comprehensive, pixels, ocr)

    def submit_mermaid(self, pixels, visual_type, ocr):
        return self._delayed(self.extract_mermaid, pixels, visual_type, ocr)

    def submit_calculations(self, pixels, ocr, nearby):
        return self._delayed(self.extract_calculations, pixels, ocr, nearby)

    def shutdown(self):
        self._pool.shutdown(wait=True)


@needs_weights
def test_llm_latency_off_critical_path(tmp_path):
    """With per-call latency injected, wall time must stay within a couple
    of latency units of the LLM-off run (serial inline calls would cost
    ~n_segments * delay), and every patch must land in the final JSON."""
    pdf = str(tmp_path / "book.pdf")
    make_test_book(pdf, pages=8, seed=11)
    ocr = TPUOCR()

    def run(client, out):
        pipe = VisualSegmentationPipeline(
            book_id="latbook",
            pdf_path=pdf,
            output_dir=str(tmp_path / out),
            use_mermaid=True,
            config=PipelineConfig(use_vision_llm=False),
            llm_client=client,
            ocr=ocr,
            resume=False,
        )
        t0 = time.time()
        pipe.process()
        return time.time() - t0, pipe

    base_wall, _ = run(DelayedFakeClient(delay=0.0), "out0")

    delay = 1.5
    client = DelayedFakeClient(delay=delay)
    wall, pipe = run(client, "out1")

    payload = json.load(
        open(tmp_path / "out1" / "latbook_visual_segments.json")
    )
    n = payload["total_segments"]
    assert n >= 7
    # serial inline calls would add >= n * delay (comprehensive alone);
    # the async patch path overlaps everything on the pool
    assert wall < base_wall + 3 * delay + 4.0, (
        f"LLM latency leaked onto the critical path: base={base_wall:.1f}s "
        f"wall={wall:.1f}s n={n}"
    )
    # every segment got its late LLM analysis patched in
    for s in payload["segments"]:
        assert s["classification_method"] == "mistral_vision_comprehensive", s[
            "segment_id"
        ]


@needs_weights
def test_llm_followups_patch_in(tmp_path):
    """Mermaid/calculation follow-ups land via writer.update() too."""
    from synapta_tpu.schema import VisualType

    pdf = str(tmp_path / "book.pdf")
    make_test_book(pdf, pages=8, seed=11)

    def hint(pixels, ocr):
        # classify everything as FLOWCHART so every segment takes the
        # mermaid follow-up path
        return {
            "visual_type": VisualType.FLOWCHART,
            "confidence": 0.9,
            "metadata": {},
            "summary": "A flowchart.",
            "summary_confidence": 0.9,
            "method": "mistral_vision_comprehensive",
        }

    client = DelayedFakeClient(delay=0.3, hint_fn=hint)
    pipe = VisualSegmentationPipeline(
        book_id="fupbook",
        pdf_path=pdf,
        output_dir=str(tmp_path / "out"),
        use_mermaid=True,
        config=PipelineConfig(use_vision_llm=False),
        llm_client=client,
        ocr=TPUOCR(),
        resume=False,
    )
    pipe.process()
    payload = json.load(
        open(tmp_path / "out" / "fupbook_visual_segments.json")
    )
    assert payload["total_segments"] >= 7
    for s in payload["segments"]:
        assert s["segment_type"] == "flowchart"
        assert s["mermaid_repr"] is not None
        assert "flowchart" in s["mermaid_repr"]["mermaid_code"]


@needs_weights
def test_deferred_pixel_reads_survive_canvas_recycling(tmp_path):
    """The loader recycles batch canvases through a small ring
    (io/loader._lease_canvases); pixels handed to llm submit_* must be
    snapshotted by the PIPELINE so that clients reading them long after
    submission — e.g. the late-patch on_done path that submits follow-up
    calls once the comprehensive response lands — never observe a later
    batch's pixels. Digest each submitted array at submit time, then
    re-digest the SAME array object after the whole book has processed
    (by which point the 4-slot ring has been recycled many times over):
    any view into the ring would have changed content."""
    import zlib

    import numpy as np

    class RecordingClient(FakePixtralClient):
        def __init__(self):
            super().__init__()
            self.records = []  # (crc_at_submit, array_ref)

        def submit_comprehensive(self, pixels, ocr):
            arr = np.ascontiguousarray(pixels)
            self.records.append((zlib.crc32(arr), pixels))
            return super().submit_comprehensive(pixels, ocr)

    pdf = str(tmp_path / "book.pdf")
    make_test_book(pdf, pages=12, seed=13)
    client = RecordingClient()
    pipe = VisualSegmentationPipeline(
        book_id="ringbook",
        pdf_path=pdf,
        output_dir=str(tmp_path / "out"),
        use_mermaid=False,
        config=PipelineConfig(use_vision_llm=False, pages_per_batch=2),
        llm_client=client,
        ocr=TPUOCR(),
        resume=False,
    )
    pipe.process()
    assert len(client.records) >= 10  # enough batches to wrap the ring
    import numpy as np  # noqa: F811
    for i, (crc0, arr) in enumerate(client.records):
        arr = np.ascontiguousarray(arr)
        assert zlib.crc32(arr) == crc0, (
            f"submission {i}: pixels mutated after submit — a recycled "
            "ring view leaked through the llm submit boundary"
        )
