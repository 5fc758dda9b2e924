"""Round-3 throughput sweep: batch-shape and round-trip amortization A/B.

Interleaves configurations (tunnel weather swings >2x between runs of
identical code) and reports best-of-N per config over the cached
1,000-page bench book. CPU-side stage totals come from the profiler.

Usage: python scripts/sweep_r3.py [reps] [cfg ...]
  cfg tokens like base, cb32, lb256, cb32lb256, ppb32
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SYNAPTA_LOG_LEVEL", "WARNING")

CFGS = {
    "base": {},
    "ppb32": {"pages_per_batch": 32},
    "cb32": {"crop_batch": 32},
    "lb256": {"line_batch": 256},
    "cb32lb256": {"crop_batch": 32, "line_batch": 256},
    "cb64lb256": {"crop_batch": 64, "line_batch": 256},
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or ["base", "cb32", "cb32lb256"]

    from synapta_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    from synapta_tpu.config import OCRConfig, PipelineConfig
    from synapta_tpu.pipeline import VisualSegmentationPipeline
    from synapta_tpu.utils.profiler import TIMERS

    pdf = os.environ.get("SYNAPTA_SWEEP_PDF")
    if not pdf:
        # same cache key bench.py uses: (pages, seed, generator hash)
        import hashlib
        import tempfile

        import synapta_tpu.io.pdf_writer as _pw

        gen_hash = hashlib.md5(
            open(_pw.__file__, "rb").read()
        ).hexdigest()[:10]
        pdf = os.path.join(
            tempfile.gettempdir(), "synapta_bench_books",
            f"textbook_p1000_s42_{gen_hash}.pdf",
        )
    n_pages = int(os.environ.get("SYNAPTA_SWEEP_PAGES", "1000"))
    if not os.path.exists(pdf):
        raise SystemExit("bench book missing; run bench.py once first")

    best: dict = {}
    run_id = 0
    for rep in range(reps):
        for name in names:
            ov = CFGS[name]
            ocr_kw = {k: v for k, v in ov.items()
                      if k in ("crop_batch", "line_batch")}
            cfg = PipelineConfig(
                use_vision_llm=False,
                pages_per_batch=ov.get("pages_per_batch", 64),
                ocr=OCRConfig(**ocr_kw),
            )
            TIMERS.totals.clear()
            TIMERS.counts.clear()
            pipe = VisualSegmentationPipeline(
                book_id=f"sw_{name}_{run_id}", pdf_path=pdf,
                taxonomy_path=None,
                output_dir=f"/tmp/sweep_r3/{name}_{run_id}",
                use_mermaid=False, config=cfg, resume=False)
            run_id += 1
            t0 = time.time()
            pipe.process()
            wall = time.time() - t0
            r = TIMERS.report()
            rec = {
                "cfg": name, "rep": rep, "wall_s": round(wall, 1),
                "pages_per_s": round(n_pages / wall, 2),
                "key": {k: round(r[k]["total_s"], 1) for k in
                        ("prepare_body", "features", "features_dispatch",
                         "ocr_recognize", "ocr_dispatch", "ocr_tile_prep")
                        if k in r},
            }
            print(json.dumps(rec), flush=True)
            if name not in best or wall < best[name]:
                best[name] = wall
    print(json.dumps({"best": {k: round(n_pages / v, 2)
                               for k, v in best.items()}}), flush=True)


if __name__ == "__main__":
    main()
