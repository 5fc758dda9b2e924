"""Multi-book queue (synapta_tpu/serve.py): shared device state across
books, durable manifest resume at book granularity, structured events,
and survival of a bad book."""
import json
import os

from synapta_tpu.config import PipelineConfig
from synapta_tpu.io.pdf_writer import make_test_book
from synapta_tpu.llm.fake import DisabledClient
from synapta_tpu.serve import BookQueue


def _mk_queue(tmp_path, out="queue_out"):
    return BookQueue(
        output_root=str(tmp_path / out),
        config=PipelineConfig(use_vision_llm=False, pages_per_batch=4),
        llm_client=DisabledClient(),
    )


def test_queue_processes_books_and_resumes(tmp_path):
    pdfs = []
    for i in range(2):
        p = str(tmp_path / f"book{i}.pdf")
        make_test_book(p, pages=3, seed=i)
        pdfs.append(p)

    q = _mk_queue(tmp_path)
    for p in pdfs:
        q.add(p)
    manifest = q.run()
    assert all(r["status"] == "done" for r in manifest["books"].values())
    assert all(r["segments"] > 0 for r in manifest["books"].values())
    for i in range(2):
        out = tmp_path / "queue_out" / f"book{i}"
        assert (out / f"book{i}_visual_segments.json").exists()
        assert (out / f"book{i}_visual_summary.csv").exists()

    # events stream carries started/done per book
    events = [
        json.loads(ln)
        for ln in open(tmp_path / "queue_out" / "queue_events.jsonl")
    ]
    kinds = [(e["book_id"], e["event"]) for e in events]
    assert ("book0", "book_started") in kinds
    assert ("book1", "book_done") in kinds

    # a SECOND run skips completed books entirely (manifest resume):
    # pipeline construction never happens, so wall time is ~0
    q2 = _mk_queue(tmp_path)
    for p in pdfs:
        q2.add(p)
    m2 = q2.run()
    assert all(r["status"] == "done" for r in m2["books"].values())
    ev2 = [
        json.loads(ln)
        for ln in open(tmp_path / "queue_out" / "queue_events.jsonl")
    ]
    # no new started events were appended
    assert len(ev2) == len(events)


def test_queue_survives_bad_book(tmp_path):
    good = str(tmp_path / "good.pdf")
    make_test_book(good, pages=2, seed=3)
    bad = str(tmp_path / "bad.pdf")
    with open(bad, "wb") as f:
        f.write(b"%PDF-1.4\nnot really a pdf")

    q = _mk_queue(tmp_path, out="q2")
    q.add(bad)
    q.add(good)
    manifest = q.run()
    assert manifest["books"]["bad"]["status"] == "failed"
    assert manifest["books"]["bad"]["error"]
    assert manifest["books"]["good"]["status"] == "done"
    assert manifest["books"]["good"]["segments"] > 0
