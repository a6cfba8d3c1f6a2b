"""Approximate-nearest-neighbor search over an embedding column.

Two tiers (training-data-pipeline ops, beyond the reference's surface):
  * cosine_topk      — brute-force exact top-k: probe x corpus cross join
                       with JVM-side higher-order-function dot products,
                       window top-k. Baseline + correctness oracle.
  * lsh_cosine_topk  — scale path: random-hyperplane (SRP) LSH bucketing;
                       only same-bucket pairs are scored. At 10^12 rows the
                       cross join is impossible; bucketing makes the join
                       equi on (table, bucket) and AQE handles skew.

Embeddings are array<float>; all arithmetic is cast to double and stays in
codegen (F.aggregate/F.zip_with) — no Python in the scoring path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SRP_BITS = 16  # 2^16 buckets; tune to corpus size / recall target


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per probe (excluding self).

    Broadcast the probe side — the corpus never shuffles; each corpus
    partition streams past the in-memory probe table.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("pv"), F.col("cv"))
                    / (_norm(F.col("pv")) * _norm(F.col("cv"))), 6),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def srp_bucket(df: DataFrame, vec_col: str = "embedding",
               bits: int = SRP_BITS, dim: int = 64, seed: int = 42) -> DataFrame:
    """Signed-random-projection bucket id per row (JVM-side).

    Hyperplanes are a deterministic literal matrix (seeded numpy) compiled
    into the plan — no shuffle, no UDF.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((bits, dim))
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        row = planes[b]
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in row]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return df.withColumn("bucket", bucket)


def lsh_cosine_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bits: int = 4, n_tables: int = 8, dim: int = 64
                    ) -> DataFrame:
    """Bucketed ANN with multi-table OR-amplification: a pair is a
    candidate if it collides in ANY of `n_tables` independent SRP tables
    (candidate prob = 1-(1-(1-theta/pi)^bits)^n_tables). Candidates are
    unioned + distinct'd, vectors attached once, scored once, window top-k.

    Recall/cost dial: more bits -> smaller buckets (cheaper, lower recall);
    more tables -> higher recall (linear cost in bucketing passes).
    """
    pairs: DataFrame | None = None
    for t in range(n_tables):
        cb = srp_bucket(corpus, vec_col, bits, dim, seed=42 + t).select(
            F.col(id_col).alias("neighbor_id"), "bucket"
        )
        pb = srp_bucket(probes, vec_col, bits, dim, seed=42 + t).select(
            F.col(id_col).alias("probe_id"), "bucket"
        )
        p = cb.join(F.broadcast(pb), "bucket").select("probe_id", "neighbor_id")
        pairs = p if pairs is None else pairs.unionAll(p)
    assert pairs is not None
    pairs = pairs.filter(F.col("probe_id") != F.col("neighbor_id")).distinct()

    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv"))
    pv = probes.select(F.col(id_col).alias("probe_id"),
                       F.col(vec_col).alias("pv"))
    scored = (
        pairs.join(cv, "neighbor_id")
        .join(F.broadcast(pv), "probe_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("pv"), F.col("cv"))
                    / (_norm(F.col("pv")) * _norm(F.col("cv"))), 6),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )
