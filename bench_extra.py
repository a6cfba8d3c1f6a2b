#!/usr/bin/env python
"""Round-6 measurement harness (bench.py is FROZEN for driver measurement;
this file holds the extra instrumentation the optimization round needs —
guide §1.4 noop-sink isolation, min-of-N laps per catalog entry, and
per-query shuffle-byte deltas so a noisy wall is self-evident; VERDICT r5
Next #1 implemented outside the frozen harness).

Usage:
  python bench_extra.py [--laps N] [--queries a,b,c] [--pipeline]
Prints one JSON line: per-query {laps: [...], min, shuffle_write, shuffle_read}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "d2_exact_clusters", "b1_candidate_pairs", "h1_prefix_groups",
    "s6_lang_census", "ngram_shingles", "minhash_lsh_candidates",
    "simhash_signatures", "ann_cosine_topk", "lineitem_pricing",
    "order_customer_join", "ivf_cosine_topk", "lsh_emb_dups",
    "emb_dup_clusters", "ngram_jaccard_dups", "simhash_dups",
]


def main() -> None:
    laps = 3
    if "--laps" in sys.argv:
        laps = int(sys.argv[sys.argv.index("--laps") + 1])
    names = DEFAULT_QUERIES
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    import __spark_entry__ as entrymod
    from bench import _shuffle_totals, _warmup, run_pipeline_once
    from dedupe_rust_spark.session import get_spark

    spark = get_spark(app=f"bench_extra[{CPUS}]", cpus=CPUS)
    _warmup(spark)

    out: dict[str, dict] = {}
    if "--pipeline" in sys.argv:
        pipe = run_pipeline_once(spark, CPUS, SF_DIR)
        out["full_dedup_pipeline"] = {
            "laps": pipe["laps"], "min": min(pipe["laps"]),
            "stage_ms": pipe.get("stage_ms"),
            "shuffle_write": pipe.get("shuffle_write_bytes"),
            "shuffle_read": pipe.get("shuffle_read_bytes"),
        }

    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            continue
        walls: list[float] = []
        shuffle = None
        for lap in range(laps):
            spark.sparkContext.setJobDescription(f"bx:{name}:lap{lap}")
            s0 = _shuffle_totals(spark)
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            wall = time.monotonic() - t0
            s1 = _shuffle_totals(spark)
            walls.append(round(wall, 3))
            if s0 is not None and s1 is not None and (
                    shuffle is None or wall <= min(walls)):
                shuffle = {k.replace("_bytes", ""): s1[k] - s0[k] for k in s0}
            spark.sparkContext.setJobDescription(None)
        out[name] = {"laps": walls, "min": min(walls), **(shuffle or {})}
    print(json.dumps({"metric": "bench_extra", "cpus": CPUS,
                      "sf_dir": SF_DIR, "laps": laps, "queries": out}))


if __name__ == "__main__":
    main()
