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


def _pair_cosine_udf():
    """Arrow pandas UDF: (va, vb) -> cosine double, numerically IDENTICAL
    to the builtin higher-order form round(_dot(va,vb)/(_norm(va)*_norm(vb)))
    before the round: the numpy loop below performs the same IEEE-754
    double operations in the same order as the F.aggregate left folds
    (cast each float element to double, multiply, accumulate element 0..d-1,
    sqrt the norm folds, multiply the two norms, divide) — so the value is
    bit-identical and the brute-force DuckDB equality oracle is untouched.

    Why a UDF: higher-order-function folds evaluate per element per row
    outside whole-stage codegen; at millions of candidate pairs the
    interpreted fold dominated the banded-pairs query (measured 45-60 s
    executor CPU for ~2M pairs at sf0.1, with multi-x lap-to-lap JIT
    variance). One vectorized numpy pass per Arrow batch does the same
    arithmetic in milliseconds (guide §4.2). Rounding stays JVM-side
    (Spark round is BigDecimal HALF_UP — not numpy's rounding)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    def _fold_cosine(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        dot = np.zeros(len(A))
        na = np.zeros(len(A))
        nb = np.zeros(len(A))
        for d in range(A.shape[1]):  # left fold, same order as F.aggregate
            dot += A[:, d] * B[:, d]
            na += A[:, d] * A[:, d]
            nb += B[:, d] * B[:, d]
        return dot / (np.sqrt(na) * np.sqrt(nb))

    @pandas_udf(T.DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        nulls = va.isna().to_numpy() | vb.isna().to_numpy()
        if not nulls.any():  # hot path: one vstack, no per-row pandas calls
            A = np.vstack(va.to_numpy()).astype(np.float64)
            B = np.vstack(vb.to_numpy()).astype(np.float64)
            return pd.Series(_fold_cosine(A, B))
        out = pd.Series(np.full(len(va), None, dtype=object))
        valid = np.where(~nulls)[0]
        if len(valid):
            A = np.vstack(va.iloc[valid].to_numpy()).astype(np.float64)
            B = np.vstack(vb.iloc[valid].to_numpy()).astype(np.float64)
            out.iloc[valid] = _fold_cosine(A, B)
        return out

    return cos


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
    per-bucket pair fan-out); tables buy back the recall that extra bits
    cost.

    Plan shape (round 6): ONE shuffle of the band stream — buckets are
    grouped (collect_list, map-side combinable) and each in-block pair is
    emitted once via nested explodes, the same candidate shape as the text
    path (blocking.prune_blocks + candidates.candidate_pairs). The former
    banded self-join shuffled/broadcast the band stream per join side and
    probed m^2 rows per bucket. Pair dedup is the one pair-sized exchange;
    vectors are attached by id joins (broadcast here; hash joins of
    pairs — small relative to the corpus — at scale) and scored by the
    bit-exact Arrow batch cosine (_pair_cosine_udf)."""
    ids = df.select(id_col, vec_col)
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    # the banding UDF inherits the scan's split count: a small single-file
    # corpus runs the matmul on ONE task. Spread it — but only when the
    # scan is actually under-parallel (a 100 TB corpus scan already yields
    # tens of thousands of splits; the split count is known from footer
    # metadata, no job runs). The same signal marks the corpus small enough
    # to broadcast on the vector-attach joins below.
    small_corpus = ids.rdd.getNumPartitions() < par
    if small_corpus:
        ids = ids.repartition(2 * par)
    blocks = srp_band_blocks(ids, id_col, vec_col, bits, n_tables, dim, seed)
    grouped = (
        blocks.groupBy("block_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # pair generation is quadratic per block while a grouped row is a few
    # KB: AQE's byte-based coalescing would pack the blocks into 1-2
    # post-shuffle partitions and serialize the explode. Spread the block
    # rows round-robin (tiny shuffle; deterministic placement via Spark's
    # sort-before-repartition) so the fan-out uses the whole cluster.
    # Pairs come from posexplode + slice over the SORTED id array — each
    # in-block pair once, already canonical (id_a < id_b), with no
    # per-element lambda (the F.filter higher-order form paid an
    # interpreted predicate per array element — measured 6-77 s of
    # JIT-dependent CPU for ~16M element visits).
    grouped = grouped.repartition(2 * par)
    pairs = (
        grouped.select(F.posexplode("ids").alias("_i", "vec_id_a"), "ids")
        .select(
            "vec_id_a",
            F.explode(F.slice("ids", F.col("_i") + 2, F.size("ids"))
                      ).alias("vec_id_b"),
        )
        .distinct()
    )
    # vector attach: project from the ORIGINAL df (not the repartitioned
    # stream) so the planner sees the bare scan; on a small corpus force
    # the build side to the vector table — the planner otherwise broadcast
    # the PAIRS side (a driver-built multi-million-row hash relation,
    # measured as BuildLeft on a 2M-row pair table). At 10^9 rows neither
    # side fits a broadcast and the attach degrades to the shuffled
    # pair-by-id joins the docstring describes.
    va = df.select(F.col(id_col).alias("vec_id_a"),
                   F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("vec_id_b"),
                   F.col(vec_col).alias("vb"))
    if small_corpus:
        va, vb = F.broadcast(va), F.broadcast(vb)
    # asNondeterministic: the threshold filter references the UDF column;
    # without it the optimizer pushes the filter below the projection and
    # evaluates the UDF (and its Arrow transfer) TWICE (guide §4.4 —
    # verified in the physical plan: two ArrowEvalPython nodes).
    cos = _pair_cosine_udf().asNondeterministic()
    return (
        pairs.join(va, "vec_id_a").join(vb, "vec_id_b")
        .withColumn("cosine", F.round(cos(F.col("va"), F.col("vb")), 4))
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

    Round 6: the SAMPLED path collects the sample once and runs Lloyd in
    driver-side numpy (same init: the n_cells smallest-id sample vectors;
    same assignment rule as _ivf_cells_udf: squared-L2 via
    |c|^2 - 2 v.C with first-minimum tie-break; empty cells keep their
    centroid). The distributed loop ran iters+1 driver-synchronized jobs,
    each planning + codegening a fresh 64-column aggregation — measured
    ~1.5-2 s of serial driver latency per codebook at catalog scale for
    ~1 ms of arithmetic. The sample is bounded driver state by
    construction (1/M of the corpus; choose M so n/M stays collectable —
    the codebook itself is already driver-resident broadcast state).
    Codebook floats may differ from the distributed reduction in final
    ulps (summation order); every consumer is tie-robust (IVF recall is
    partition-complete for any codebook — inv_ivf_recall).
    train_sample_mod=None keeps the distributed loop unchanged.

    Scale shape: training is one sampled scan + driver k-means; the
    full-corpus path stays one scan + one n_cells-group aggregation per
    iteration.
    """
    full = corpus.select(id_col, vec_col)
    if train_sample_mod is not None and train_sample_mod > 1:
        import numpy as np

        rows = (
            full.filter(F.pmod(F.xxhash64(F.col(id_col)),
                               F.lit(train_sample_mod)) == 0)
            .collect()
        )
        if len(rows) >= n_cells:
            ids = np.array([r[id_col] for r in rows])
            M = np.array([r[vec_col] for r in rows], dtype=np.float64)
            C = M[np.argsort(ids, kind="stable")[:n_cells]].copy()
            for _ in range(iters):
                d = (C * C).sum(axis=1)[None, :] - 2.0 * (M @ C.T)
                assign = np.argmin(d, axis=1)  # first-min tie-break,
                # matching _ivf_cells_udf's stable argsort
                for c in range(n_cells):
                    members = M[assign == c]
                    if len(members):
                        C[c] = members.mean(axis=0)
            return [[float(x) for x in row] for row in C]
        # sample too small for the codebook — deterministic full-corpus
        # fallback (the distributed loop below)

    # every Lloyd iteration (and the seed collect) scans the corpus: cache
    # the lean (id, vec) projection for the duration of training instead
    # of re-reading the source per iteration (at scale: iters+1 scans ->
    # one scan + cached reads)
    lean = full.cache()
    try:
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
