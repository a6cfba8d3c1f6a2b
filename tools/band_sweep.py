"""LSH band-scheme sweep (round-3 verdict task 1): run the identical
pipeline under 32x4 / 24x5 / 16x8 banding over the fixed k=128 MinHash
and record, per scheme: wall, shuffle bytes, candidate-pair counts, and
pairwise F1 at 10k pages (guardrail: gate >= 0.99, no threshold
retuning). Results table lives in BENCH/BASELINE.md.

Usage: python tools/band_sweep.py [n_pages] [bands ...]   # default 400000, 32 24 16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "1")


def main() -> None:
    from f1_eval import f1_at  # noqa: E402 (sibling tool)

    from bench import _shuffle_totals  # noqa: E402 (repo-root bench)
    from dedupe_rust_spark.datagen import pages_dir_for
    from dedupe_rust_spark.plans.pipeline import DedupPipeline, PipelineConfig
    from dedupe_rust_spark.session import get_spark

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    schemes = [int(b) for b in sys.argv[2:]] or [32, 24, 16]

    spark = get_spark(app="band_sweep", cpus=32)
    pages_dir = pages_dir_for("/root/testdata/sf0.1", n_rows=n_pages)
    for bands in schemes:
        cfg = PipelineConfig(checkpoints=False,
                             lsh_bands=None if bands == 32 else bands)
        DedupPipeline(spark, pages_dir, config=cfg).run()  # warm lap
        s0 = _shuffle_totals(spark)
        t0 = time.monotonic()
        pipe = DedupPipeline(spark, pages_dir, config=cfg)
        n_clustered = pipe.run().count()
        wall = time.monotonic() - t0
        s1 = _shuffle_totals(spark)
        n_pairs = next((m["rows_out"] for m in pipe.stage_metrics
                        if m["stage"] == "candidates"), 0)
        f1 = f1_at(spark, 10_000, cfg=cfg)
        print(json.dumps({
            "bands": bands, "rows_per_band": 128 // bands,
            "pages": n_pages, "wall_sec": round(wall, 2),
            "candidate_pairs": n_pairs, "clustered_urls": n_clustered,
            "shuffle_write": (s1["shuffle_write_bytes"]
                              - s0["shuffle_write_bytes"]) if s0 else None,
            "shuffle_read": (s1["shuffle_read_bytes"]
                             - s0["shuffle_read_bytes"]) if s0 else None,
            "f1_10k": f1,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
