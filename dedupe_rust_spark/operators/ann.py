"""Approximate-nearest-neighbor search over an embedding column.

Two tiers (training-data-pipeline ops, beyond the reference's surface):
  * cosine_topk      — brute-force exact top-k: probe x corpus cross join
                       with JVM-side higher-order-function dot products,
                       window top-k. Baseline + correctness oracle.
  * lsh_cosine_topk  — scale path: random-hyperplane (SRP) LSH bucketing;
                       only same-bucket pairs are scored. At 10^12 rows the
                       cross join is impossible; bucketing makes the join
                       equi on (table, bucket) and AQE handles skew.

Embeddings are array<float>; pair/probe scoring arithmetic is cast to
double and stays in codegen (F.aggregate/F.zip_with). The one Python
surface is SRP bucketing (_srp_buckets_udf): a dense matmul against a
constant plane matrix, done as one Arrow-batch numpy matmul — the
expression-tree form was a measured plan-size pathology (see the UDF's
docstring).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves the Arrow UDF type hints
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
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"),
        _norm(F.col(vec_col)).alias("pn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("pv"), F.col("cv"))
                    / (F.col("pn") * F.col("cn")), 6),
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


def _srp_buckets_udf(planes, bits: int):
    """Arrow pandas UDF: embedding -> array<long> of per-table SRP bucket
    ids, ONE numpy matmul per batch ((n, dim) @ (dim, tables*bits), sign,
    bit-pack). Deterministic: the plane matrix is a seeded literal baked
    into the UDF closure.

    Why a UDF here when every other ANN expression is builtin: the
    expression-tree forms are pathological at this fan-out — per-plane
    expressions build n_planes*dim literal nodes (a ~16k-node plan whose
    analysis/codegen took ~50 s for a 2,000-row corpus, measured round 4),
    and a single nested-array literal + higher-order functions stalls the
    analyzer on the 16k-element literal. A dense matmul against a constant
    matrix is exactly the Arrow-batch case; the scoring path (dot/cosine
    of PAIRED rows) stays builtin."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    n_tables = planes.shape[0] // bits
    W = planes.T.copy()                      # (dim, tables*bits)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def srp(col: pd.Series) -> pd.Series:
        rows = col.tolist()
        out: list[list[int] | None] = [None] * len(rows)
        valid = [i for i, v in enumerate(rows) if v is not None]
        if valid:
            M = np.asarray([rows[i] for i in valid], dtype=np.float64)
            S = (M @ W) > 0                          # (n, tables*bits)
            B = (S.reshape(len(valid), n_tables, bits)
                 * weights).sum(axis=2)              # (n, tables)
            for j, i in enumerate(valid):
                out[i] = [int(x) for x in B[j]]
        return pd.Series(out)

    return srp


def srp_bucket(df: DataFrame, vec_col: str = "embedding",
               bits: int = SRP_BITS, dim: int = 64, seed: int = 42) -> DataFrame:
    """Signed-random-projection bucket id per row (one table).

    Hyperplanes are a deterministic seeded matrix; bucketing is the
    batched matmul UDF (_srp_buckets_udf)."""
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal((bits, dim))
    udf = _srp_buckets_udf(planes, bits)
    return df.withColumn("bucket", udf(F.col(vec_col))[0])


def srp_band_blocks(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", bits: int = 4,
                    n_tables: int = 8, dim: int = 64, seed: int = 42,
                    seed_per_table: bool = False) -> DataFrame:
    """All SRP tables in ONE pass: -> (id, block_key) rows via a single
    posexplode, the same banding shape as MinHash-LSH (blocking.lsh_blocks).
    One scan, one explode, no per-table union — at 10^9 rows this is one
    shuffle-join key stream instead of n_tables separate plans.

    seed_per_table=True draws table t's hyperplanes from RandomState(seed+t)
    (first `bits` rows) — the exact plane family of the per-table
    srp_bucket(seed=seed+t) loop, so callers migrating from per-table plans
    keep identical bucket assignments. Default False keeps the one-stream
    family used by lsh_cosine_pairs (its equality oracle pins it)."""
    import numpy as np

    if seed_per_table:
        planes = np.concatenate([
            np.random.RandomState(seed + t).standard_normal((bits, dim))
            for t in range(n_tables)
        ])
    else:
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((n_tables * bits, dim))
    udf = _srp_buckets_udf(planes, bits)
    # block_key is an 8-byte long (xxhash64 of table+bucket), matching the
    # text path's band keys (blocking.py lsh_blocks): at 10^9+ vectors x 64
    # tables a varchar "t:b" key is avoidable shuffle bytes + string
    # comparisons in the banded self-join. Consumers join on the key only
    # (pair-set oracles pin pairs, not keys), so the encoding is free to be
    # opaque.
    return df.select(
        F.col(id_col), F.posexplode(udf(F.col(vec_col))).alias("table", "bucket")
    ).select(
        F.xxhash64(F.col("table"), F.col("bucket")).alias("block_key"),
        id_col,
    )


def lsh_cosine_pairs(df: DataFrame, threshold: float = 0.35,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     bits: int = 4, n_tables: int = 64, dim: int = 64,
                     seed: int = 42) -> DataFrame:
    """Embedding near-dup pairs via bucketed LSH: only same-bucket pairs are
    scored — the 100TB-shaped twin of the brute-force theta join
    (plans/queries.q_emb_cosine_dups). Strong OR-amplification (default 64
    tables x 4 bits) makes recall at `threshold` effectively 1 on small
    corpora, so the brute-force DuckDB SQL is a hard equality oracle.

    Scale dial: bits grows with corpus size (bucket count 2^bits bounds the
    per-bucket self-join); tables buy back the recall that extra bits cost.
    """
    ids = df.select(id_col, vec_col)
    # both sides of the self-join consume the banded stream: materialize
    # it once so the bucket UDF pass runs once, not per join side
    blocks = srp_band_blocks(ids, id_col, vec_col, bits, n_tables, dim,
                             seed).localCheckpoint(eager=False)
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(b, "block_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("vec_id_a"),
                F.col(f"b.{id_col}").alias("vec_id_b"))
        .distinct()
    )
    # norms are per-VECTOR quantities: compute them once on the n-row side
    # of each join instead of re-evaluating the norm fold on every one of
    # the candidate-pair rows (same expression on the same data -> same
    # float values; only the dot stays per-pair)
    va = ids.select(F.col(id_col).alias("vec_id_a"),
                    F.col(vec_col).alias("va"),
                    _norm(F.col(vec_col)).alias("na"))
    vb = ids.select(F.col(id_col).alias("vec_id_b"),
                    F.col(vec_col).alias("vb"),
                    _norm(F.col(vec_col)).alias("nb"))
    return (
        pairs.join(va, "vec_id_a").join(vb, "vec_id_b")
        .withColumn("cosine", F.round(_dot(F.col("va"), F.col("vb"))
                                      / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def suggest_n_cells(corpus_rows: int) -> int:
    """~sqrt(n) codebook sizing (the standard IVF heuristic: balances the
    centroid scan against inverted-list length — each is ~sqrt(n) work per
    probe). 16 is fine for test corpora; a 10^9-row corpus wants ~32k
    cells, not 16. Clamped to [1, 65536]."""
    return max(1, min(65536, int(round(corpus_rows ** 0.5))))


def ivf_train(corpus: DataFrame, n_cells: int = 16, iters: int = 3,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int = 64,
              train_sample_mod: int | None = None) -> list[list[float]]:
    """Deterministic k-means coarse quantizer (Lloyd iterations, all
    DataFrame ops): init = the vectors of the n_cells smallest ids
    (data-dependent, seedless, reproducible); each iteration assigns rows
    to their nearest centroid via the batched codebook-matmul UDF
    (_ivf_cells_udf) and recomputes per-dimension means with one
    groupBy. Centroids are k x dim floats — driver-resident by design
    (the coarse codebook of an IVF index is broadcast state, like a
    dimension table).

    train_sample_mod=M trains on the deterministic 1/M subset
    pmod(xxhash64(id), M) == 0 — at 10^9+ rows Lloyd does not need the
    full corpus to place ~sqrt(n) centroids, and the sample cuts every
    training scan by M while the one full-corpus ASSIGNMENT pass
    (ivf_assign) is unchanged. Deterministic: the subset is a fixed
    function of ids. If the sample holds fewer than n_cells rows the
    sample is ignored (full-corpus training) so tiny corpora never train
    a degenerate codebook. None = train on everything.

    Scale shape: each iteration is one (sampled) corpus scan + one
    n_cells-group aggregation; no shuffle grows with corpus size beyond
    the tiny (cell, partial-sums) stream.
    """
    # every Lloyd iteration (and the seed collect) scans the corpus: cache
    # the lean (id, vec) projection for the duration of training instead
    # of re-reading the source per iteration (at scale: iters+1 scans ->
    # one scan + cached reads)
    full = corpus.select(id_col, vec_col)
    lean = full
    if train_sample_mod is not None and train_sample_mod > 1:
        lean = full.filter(
            F.pmod(F.xxhash64(F.col(id_col)),
                   F.lit(train_sample_mod)) == 0)
    lean = lean.cache()
    try:
        seeds = lean.orderBy(id_col).limit(n_cells).collect()
        if len(seeds) < n_cells and lean is not full:
            # sample too small for the codebook — fall back to the full
            # corpus (deterministic either way)
            lean.unpersist()
            lean = full.cache()
            seeds = lean.orderBy(id_col).limit(n_cells).collect()
        centroids = [list(map(float, r[vec_col])) for r in seeds]
        for _ in range(iters):
            cell_udf = _ivf_cells_udf(centroids, n_nearest=1)
            assigned = lean.select(
                vec_col, cell_udf(F.col(vec_col))[0].alias("cell"))
            sums = assigned.groupBy("cell").agg(
                F.count("*").alias("n"),
                *[F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
                  for i in range(dim)],
            ).collect()
            new = list(centroids)
            for r in sums:
                if r["n"] > 0:
                    new[int(r["cell"])] = [r[f"s{i}"] / r["n"]
                                           for i in range(dim)]
            centroids = new
    finally:
        lean.unpersist()
    return centroids


def _ivf_cells_udf(centroids: list[list[float]], n_nearest: int = 1):
    """Arrow pandas UDF: embedding -> the n_nearest cell ids by squared
    L2 distance to the (constant, driver-resident) codebook — one numpy
    distance matrix per batch, ||v-c||^2 = |v|^2 - 2 v.C + |c|^2, stable
    argsort (distance ties break by cell index, matching the former
    array_sort(struct(d, cell)) expression). Same plan-size rationale as
    _srp_buckets_udf: per-centroid literal expressions built
    n_cells*dim-node trees that dominated small-query wall time."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)          # (cells, dim)
    c_sq = (C * C).sum(axis=1)                           # (cells,)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(col: pd.Series) -> pd.Series:
        rows = col.tolist()
        out: list[list[int] | None] = [None] * len(rows)
        valid = [i for i, v in enumerate(rows) if v is not None]
        if valid:
            M = np.asarray([rows[i] for i in valid], dtype=np.float64)
            d = c_sq[None, :] - 2.0 * (M @ C.T)          # + |v|^2 (const/row)
            order = np.argsort(d, axis=1, kind="stable")[:, :n_nearest]
            for j, i in enumerate(valid):
                out[i] = [int(x) for x in order[j]]
        return pd.Series(out)

    return cells


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Attach the nearest-centroid cell id (0-based) — the IVF inverted
    list key (batched matmul UDF against the broadcast codebook)."""
    udf = _ivf_cells_udf(centroids, n_nearest=1)
    return df.withColumn("cell", udf(F.col(vec_col))[0])


def ivf_cosine_topk(corpus: DataFrame, probes: DataFrame,
                    centroids: list[list[float]], k: int = 10,
                    n_probe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF search: each probe scans only its n_probe nearest cells —
    the equi-join on cell replaces the cross join, so work scales with
    the probed fraction of the corpus (n_probe / n_cells), the classic
    IVF recall/cost dial. n_probe = n_cells degenerates to exact brute
    force (partition-completeness — the basis of the inv_ivf_recall
    oracle). Top-k per probe via window with deterministic tie-break.
    """
    n_cells = len(centroids)
    probe_cells_udf = _ivf_cells_udf(centroids,
                                     n_nearest=min(n_probe, n_cells))
    pc = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"),
        _norm(F.col(vec_col)).alias("pn"),
        F.explode(probe_cells_udf(F.col(vec_col))).alias("cell"),
    )
    cc = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      _norm(F.col(vec_col)).alias("cn")), centroids, "cv")
    scored = (
        cc.join(F.broadcast(pc), "cell")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("pv"), F.col("cv"))
                    / (F.col("pn") * F.col("cn")), 6),
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


def lsh_cosine_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bits: int = 4, n_tables: int = 8, dim: int = 64
                    ) -> DataFrame:
    """Bucketed ANN with multi-table OR-amplification: a pair is a
    candidate if it collides in ANY of `n_tables` independent SRP tables
    (candidate prob = 1-(1-(1-theta/pi)^bits)^n_tables). All tables come
    from ONE srp_band_blocks pass per side — one corpus scan + one explode
    (round-2 looped srp_bucket per table: n_tables separate corpus scans
    + unionAll). seed_per_table=True keeps the per-table plane family, so
    candidate sets — and the output rows — are identical to the loop form.
    Candidates are distinct'd, vectors attached once, scored once, window
    top-k.

    Recall/cost dial: more bits -> smaller buckets (cheaper, lower recall);
    more tables -> higher recall (linear cost in banding columns, not in
    corpus scans).
    """
    cb = srp_band_blocks(corpus, id_col, vec_col, bits, n_tables, dim,
                         seed=42, seed_per_table=True).withColumnRenamed(
        id_col, "neighbor_id")
    pb = srp_band_blocks(probes, id_col, vec_col, bits, n_tables, dim,
                         seed=42, seed_per_table=True).withColumnRenamed(
        id_col, "probe_id")
    pairs = (
        cb.join(F.broadcast(pb), "block_key")
        .select("probe_id", "neighbor_id")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .distinct()
    )

    # norms are per-VECTOR quantities: hoist the O(dim) norm fold to the
    # per-vector projections (same as cosine_topk / lsh_cosine_pairs /
    # ivf_cosine_topk) so a neighbor colliding with many probes folds its
    # norm once, not once per candidate-pair row; only the dot is per-pair
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv"),
                       _norm(F.col(vec_col)).alias("cn"))
    pv = probes.select(F.col(id_col).alias("probe_id"),
                       F.col(vec_col).alias("pv"),
                       _norm(F.col(vec_col)).alias("pn"))
    scored = (
        pairs.join(cv, "neighbor_id")
        .join(F.broadcast(pv), "probe_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("pv"), F.col("cv"))
                    / (F.col("pn") * F.col("cn")), 6),
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
