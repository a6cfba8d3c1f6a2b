"""Pair scoring: attach texts, run the vectorized scorer UDF, threshold.

Reference analog: the deep verification tier (full decode + hash equality,
/root/reference/src/main.rs:586-648) — generalized to Jaro-Winkler /
Levenshtein-ratio / shingle-Jaccard with a match decision.

Match decision (tuned on labeled_pairs, tests/test_f1.py):
  is_match := lev_sim >= 0.85  OR  jaccard >= 0.50
near_mid pairs (>= 0.85 word-edit similarity) land above both; near_low
(0.70-0.85) and adversarial pairs land below. Exact dups never reach here
(collapsed pre-blocking) but would score 1.0 anyway.

Scale note: texts are attached by two hash joins against the (deduped)
signatures table — at 100 TB the scored side is candidates (small relative
to corpus), so Catalyst shuffles pairs, not the corpus, and AQE picks
broadcast when candidates fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import score_pairs_udf

LEV_MATCH = 0.85
JACCARD_MATCH = 0.50


def score_candidates(pairs: DataFrame, sig: DataFrame,
                     lev_match: float = LEV_MATCH,
                     jaccard_match: float = JACCARD_MATCH) -> DataFrame:
    texts = sig.select("url", "text")
    joined = (
        pairs.select("url_a", "url_b")
        .join(texts.withColumnsRenamed({"url": "url_a", "text": "_ta"}), "url_a")
        .join(texts.withColumnsRenamed({"url": "url_b", "text": "_tb"}), "url_b")
    )
    # AQE coalesces the (byte-wise small) pair shuffle down to few
    # partitions, which would serialize the CPU-heavy scorer UDF. Spread
    # pairs across the cluster: cost is a tiny shuffle, win is full
    # parallelism on the most expensive per-row stage.
    par = pairs.sparkSession.sparkContext.defaultParallelism
    joined = joined.repartition(2 * par)
    scored = joined.withColumn("s", score_pairs_udf(F.col("_ta"), F.col("_tb")))
    return scored.select(
        "url_a",
        "url_b",
        F.col("s.jaro_winkler").alias("jaro_winkler"),
        F.col("s.lev_sim").alias("lev_sim"),
        F.col("s.jaccard").alias("jaccard"),
        (
            (F.col("s.lev_sim") >= lev_match)
            | (F.col("s.jaccard") >= jaccard_match)
        ).alias("is_match"),
    )


def match_edges(scores: DataFrame) -> DataFrame:
    return scores.filter(F.col("is_match")).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    )
