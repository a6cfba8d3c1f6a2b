"""Pair-stream duplication stats: the bench metric behind the round-4
candidate-pruning work (BENCH/BASELINE.md "What moved" table).

For a given page count, reports per candidate-generation mode:
  * generated (pre-dedup) pair rows — what the pair-dedup exchange carries
  * distinct pairs — what the scorer sees
  * duplication factor = generated / distinct
  * block-size histogram summary (where the quadratic blowup lives)

Usage: python tools/pair_stats.py [n_pages] [star_min_block|clique ...]
       defaults: 400000, modes [clique, 8]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from dedupe_rust_spark.datagen import pages_dir_for
    from dedupe_rust_spark.operators import blocking, signatures as sigs
    from dedupe_rust_spark.operators.candidates import candidate_pairs
    from dedupe_rust_spark.session import get_spark
    from dedupe_rust_spark.sources.pages import clean_pages, read_pages

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    modes = [None if m == "clique" else int(m) for m in sys.argv[2:]] \
        or [None, 8]

    spark = get_spark(app="pair_stats", cpus=32)
    pages_dir = pages_dir_for("/root/testdata/sf0.1", n_rows=n_pages)
    pages = clean_pages(read_pages(spark, pages_dir))
    par = spark.sparkContext.defaultParallelism
    sig = sigs.signatures(sigs.extract(pages.repartition(2 * par)))
    sig = sig.localCheckpoint()
    roots = blocking.exact_roots(sig).localCheckpoint(eager=False)
    reps = blocking.exact_representatives(sig, roots)
    pruned, _ = blocking.prune_blocks(blocking.all_blocks(reps))
    pruned = pruned.localCheckpoint()

    from dedupe_rust_spark.operators.candidates import pair_stream_stats

    for mode in modes:
        stats = pair_stream_stats(pruned, star_min_block=mode)
        distinct = candidate_pairs(pruned, keep_block_key=False,
                                   star_min_block=mode).count()
        print(json.dumps({
            "pages": n_pages,
            "mode": "clique" if mode is None else f"star{mode}",
            **stats, "distinct_pairs": distinct,
            "dup_factor": round(stats["generated_pair_rows"]
                                / max(distinct, 1), 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
