"""Per-stage shuffle-byte profile of the dedup pipeline: run once at a
given page count with the UI on, then dump every Spark stage's
(write/read bytes, records, name) sorted by write bytes — the auditable
evidence behind BENCH/BASELINE.md's shuffle-volume claims.

Usage: SPARK_GRAFT_CPUS=32 python tools/shuffle_profile.py [n_rows] [--constant-family]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_UI"] = "1"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(args[0]) if args else 400000
    cf = "--constant-family" in sys.argv

    from dedupe_rust_spark.datagen import pages_dir_for
    from dedupe_rust_spark.plans.pipeline import DedupPipeline, PipelineConfig
    from dedupe_rust_spark.session import get_spark

    spark = get_spark(app="shuffle_profile")
    pages_dir = pages_dir_for("/root/testdata/sf0.1", n_rows=n_rows,
                              constant_family=cf)
    pipe = DedupPipeline(spark, pages_dir,
                         config=PipelineConfig(checkpoints=False))
    clusters = pipe.run()
    print("clustered:", clusters.count())

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete",
        timeout=20,
    ) as r:
        stages = json.load(r)
    rows = [
        {
            "stageId": s["stageId"],
            "write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "write_recs": s.get("shuffleWriteRecords", 0),
            "name": (s.get("name") or "")[:90],
        }
        for s in stages
    ]
    rows.sort(key=lambda x: -x["write_mb"])
    tot_w = sum(x["write_mb"] for x in rows)
    tot_r = sum(x["read_mb"] for x in rows)
    print(f"TOTAL write {tot_w:.0f} MB, read {tot_r:.0f} MB")
    for x in rows[:25]:
        print(f"{x['stageId']:>5} w={x['write_mb']:>8} r={x['read_mb']:>8} "
              f"recs={x['write_recs']:>10}  {x['name']}")

    # plan-node attribution: every Exchange node's "shuffle bytes written"
    # across all SQL executions, with the node's place in the plan
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=200",
        timeout=20,
    ) as r:
        sqls = json.load(r)
    print("\n--- per-plan-node shuffle writes (>= 20 MB) ---")
    for q in sqls:
        desc = (q.get("description") or "").split("\n")[0][:70]
        print(f"sql={q['id']:>3} {q.get('status','')} {desc}")
        for node in q.get("nodes", []):
            for m in node.get("metrics", []):
                if m.get("name") == "shuffle bytes written":
                    v = m.get("value", "")
                    # values look like "total (min, med, max)\n1276.4 MiB ..."
                    first = v.split("\n")[-1].split("(")[0].strip()
                    if ("GiB" in first
                            or ("MiB" in first
                                and float(first.split(" ")[0]) >= 2)):
                        print(f"      node={node['nodeId']:>3} "
                              f"{node['nodeName'][:40]:<40} {first}")
    spark.stop()


if __name__ == "__main__":
    main()
