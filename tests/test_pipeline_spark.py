"""End-to-end Spark pipeline tests (SURVEY.md §5.2: oracle, golden,
property, parity). Session-scoped SparkSession, tiny (sf0.001) pages."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedupe_rust_spark.functions.ccore import connected_components as uf_cc
from dedupe_rust_spark.functions.textcore import extract_text
from dedupe_rust_spark.operators import blocking, candidates as cand, cluster, scoring
from dedupe_rust_spark.operators.signatures import extract, signatures
from dedupe_rust_spark.plans.pipeline import DedupPipeline
from dedupe_rust_spark.sources.pages import clean_pages, read_labeled_pairs, read_pages


@pytest.fixture(scope="module")
def clusters(spark, tiny_pages_dir):
    pipe = DedupPipeline(spark, tiny_pages_dir)
    return pipe.run().cache()


@pytest.fixture(scope="module")
def sig(spark, tiny_pages_dir):
    pages = clean_pages(read_pages(spark, tiny_pages_dir))
    return signatures(extract(pages)).cache()


# ------------------------------------------------------------------ parity
def test_extraction_parity_byte_identical(spark, tiny_pages_dir):
    """UDF-extracted text equals the golden `text` column byte-for-byte
    (the BASELINE.json per-row invariant)."""
    pages = read_pages(spark, tiny_pages_dir)
    got = extract(pages.drop("text")).select("url", "text")
    golden = pages.select("url", F.col("text").alias("golden"))
    diff = got.join(golden, "url").filter(
        ~F.col("text").eqNullSafe(F.col("golden"))
    )
    assert diff.count() == 0


def test_extraction_parity_python_vs_spark(spark, tiny_pages_dir):
    """Driver-side pure-Python extraction agrees with the Spark UDF."""
    pages = read_pages(spark, tiny_pages_dir).limit(200).toPandas()
    for r in pages.itertuples():
        raw = None if r.html is None else bytes(r.html)
        expect = None if (not isinstance(r.text, str)) else r.text
        assert extract_text(raw) == expect


# ---------------------------------------------------------------- oracle
def test_exact_clusters_match_bruteforce(spark, sig):
    """Equality-grouping == full O(n^2) pairwise equality (the transitivity
    property the reference relies on, main.rs:616-624)."""
    local = sig.select("url", "text_sha256").toPandas()
    by_hash: dict[str, list[str]] = {}
    for r in local.itertuples():
        by_hash.setdefault(r.text_sha256, []).append(r.url)
    expect_groups = sorted(
        tuple(sorted(v)) for v in by_hash.values() if len(v) > 1
    )
    got = (
        blocking.exact_edges(sig)
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("members"))
        .toPandas()
    )
    got_groups = sorted(
        tuple(sorted([r.src] + list(r.members))) for r in got.itertuples()
    )
    assert got_groups == expect_groups


def test_f1_on_labeled_pairs(spark, tiny_pages_dir, clusters):
    """The headline gate: pairwise F1 >= 0.99 (BASELINE.md)."""
    pairs = read_labeled_pairs(spark, tiny_pages_dir)
    pred = (
        pairs
        .join(clusters.withColumnsRenamed({"url": "url_a", "cluster_id": "ca"}),
              "url_a", "left")
        .join(clusters.withColumnsRenamed({"url": "url_b", "cluster_id": "cb"}),
              "url_b", "left")
        .withColumn("pred", F.coalesce(
            F.col("ca").isNotNull() & (F.col("ca") == F.col("cb")), F.lit(False)))
    )
    tp = pred.filter("is_dup and pred").count()
    fp = pred.filter("not is_dup and pred").count()
    fn = pred.filter("is_dup and not pred").count()
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (precision, recall, f1)
    # exact tier must be perfect (F1-floor guard, SURVEY.md §7e)
    assert pred.filter("tier = 'exact' and is_dup and not pred").count() == 0


# -------------------------------------------------------------- properties
def test_partition_invariance(spark, sig):
    """Same clusters under different partitioning (FIXTURES.md §5.2.4)."""
    edges = blocking.exact_edges(sig)
    c2 = cluster.connected_components(edges.repartition(2))
    c32 = cluster.connected_components(edges.repartition(32))
    assert c2.exceptAll(c32).count() == 0 and c32.exceptAll(c2).count() == 0


def test_cross_host_exact_copies_cluster(spark, sig, clusters):
    """Exact copies on different hosts still cluster (host NOT in the
    block key for the exact tier)."""
    multi = (
        sig.groupBy("text_sha256")
        .agg(F.countDistinct("host").alias("nh"), F.collect_list("url").alias("urls"))
        .filter((F.col("nh") > 1))
        .limit(5)
        .toPandas()
    )
    assert len(multi) > 0, "generator should produce cross-host exact copies"
    cl = {r.url: r.cluster_id for r in clusters.toPandas().itertuples()}
    for row in multi.itertuples():
        ids = {cl.get(u) for u in row.urls}
        assert len(ids) == 1 and None not in ids, row.urls


def test_adversarial_same_title_not_clustered(spark, tiny_pages_dir, clusters):
    pairs = read_labeled_pairs(spark, tiny_pages_dir)
    adv = pairs.filter("tier = 'negative'")
    joined = (
        adv.join(clusters.withColumnsRenamed({"url": "url_a", "cluster_id": "ca"}),
                 "url_a", "left")
        .join(clusters.withColumnsRenamed({"url": "url_b", "cluster_id": "cb"}),
              "url_b", "left")
        .filter(F.col("ca").isNotNull() & (F.col("ca") == F.col("cb")))
    )
    # <=1% of negatives may collide via transitive closure at the boundary
    assert joined.count() <= max(1, int(0.01 * adv.count()))


def test_score_split_nondefault_threshold_refines_at_boundary(spark):
    """The refine band derives from the configured jaccard threshold: with
    jaccard_match=0.25, an estimate just above 0.25 must be EXACTLY
    refined (estimate can't decide a match at the threshold). Pair: two
    texts with exact 3-shingle Jaccard well below 0.25 but enough MinHash
    row agreement that a noisy estimate could sit near it — we assert the
    emitted jaccard equals the exact shingle value whenever the estimate
    fell inside the derived band, and that the decision matches the
    ground-truth rule."""
    from dedupe_rust_spark.functions import scorecore
    from dedupe_rust_spark.functions.udfs import refine_bounds
    from dedupe_rust_spark.operators.signatures import signatures as sig_stage

    ta = "alpha beta gamma delta epsilon zeta eta theta " * 4
    tb = "alpha beta gamma delta nine ten eleven twelve " * 4
    rows = [("https://x/a", None, ta.encode(), ta, "en"),
            ("https://x/b", None, tb.encode(), tb, "en")]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string").withColumn(
        "host", F.lit("x"))
    s = sig_stage(pages)
    ids = {r.url: r.id for r in s.select("url", "id").collect()}
    pairs = spark.createDataFrame(
        [(min(ids.values()), max(ids.values()))], "id_a long, id_b long")
    jm = 0.25
    got = scoring.score_candidates(pairs, s, jaccard_match=jm).collect()[0]
    lo, hi = refine_bounds(jm)
    exact = scorecore.jaccard_shingles(ta, tb)
    if got.is_match and got.lev_sim is None:
        # fast path fired: the estimate must have been >= the fast cut
        assert got.jaccard >= max(hi, jm)
    else:
        # slow path: inside the band the estimate must have been replaced
        # by the exact value
        if lo <= got.jaccard <= hi:
            assert abs(got.jaccard - exact) < 1e-9
        expect = (scorecore.lev_sim(ta, tb) >= scoring.LEV_MATCH
                  or got.jaccard >= jm)
        assert bool(got.is_match) == expect


def test_score_null_estimate_pairs_not_dropped(spark):
    """A pair where one side has no MinHash signature (null estimate) must
    flow through the slow path and keep a scored row — not vanish from the
    output (round-2 advice finding)."""
    ta = "some words repeated here " * 10
    sig_rows = [
        (1, "https://x/a", ta, [1] * 128),
        (2, "https://x/b", ta, None),  # no signature
    ]
    s = spark.createDataFrame(
        sig_rows, "id long, url string, text string, minhash array<smallint>")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = scoring.score_candidates(pairs, s).collect()
    assert len(out) == 1
    r = out[0]
    assert r.is_match  # identical texts: lev_sim = 1.0 decides
    assert r.lev_sim == 1.0


def test_score_split_decisions_match_exact(spark, sig):
    """The estimate-split scorer's is_match must equal the ground-truth
    decision rule (exact lev/jaccard) on real candidate pairs — the fast
    path may only skip work, never flip a decision."""
    from dedupe_rust_spark.functions import scorecore

    pruned, _ = blocking.prune_blocks(
        blocking.all_blocks(blocking.exact_representatives(sig)))
    pairs = cand.candidate_pairs(pruned, keep_block_key=False)
    got = scoring.score_candidates(pairs, sig).toPandas()
    texts = {r.id: r.text for r in sig.select("id", "text").collect()}
    flipped = 0
    for r in got.itertuples():
        ta, tb = texts[r.id_a], texts[r.id_b]
        exact = (scorecore.lev_sim(ta, tb) >= scoring.LEV_MATCH
                 or scorecore.jaccard_shingles(ta, tb) >= scoring.JACCARD_MATCH)
        if bool(r.is_match) != exact:
            flipped += 1
    # estimate noise may flip only pairs whose exact jaccard sits within
    # the estimator tail outside the refine band (~4.5 sigma): allow <=1%
    assert flipped <= max(1, len(got) // 100), (flipped, len(got))


def test_spark_cc_matches_unionfind(spark):
    import random

    rng = random.Random(13)
    nodes = [f"n{i:03d}" for i in range(120)]
    edge_list = sorted({(min(a, b), max(a, b))
                        for a, b in ((rng.choice(nodes), rng.choice(nodes))
                                     for _ in range(100)) if a != b})
    expect = uf_cc(edge_list)
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r.node: r.cluster_id
           for r in cluster.connected_components(edges).collect()}
    assert got == expect


def test_prune_unsalted_pairs_unchanged(spark, sig):
    """For blocks below the cap, prune_blocks must be a pure HAVING>1
    filter: the candidate pair set equals the brute-force per-block pairs
    (salting only rewrites oversized keys)."""
    blocks = blocking.all_blocks(blocking.exact_representatives(sig))
    kept, _ = blocking.prune_blocks(blocks, max_block=10**9)  # nothing salts
    got = {(r.id_a, r.id_b)
           for r in cand.candidate_pairs(kept, keep_block_key=False).collect()}
    local = blocks.toPandas()
    expect = set()
    for _, grp in local.groupby("block_key"):
        ids = sorted(grp["id"])
        if len(ids) > 1:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    expect.add((ids[i], ids[j]))
    assert got == expect


def test_id_audit_fires_on_collision(spark):
    """The surrogate-key audit must fail fast when one id carries two
    distinct urls, and pass on clean data."""
    from dedupe_rust_spark.plans.pipeline import _audit_ids

    clean = spark.createDataFrame(
        [(1, "https://a/x"), (2, "https://a/y")], "id long, url string")
    _audit_ids(clean)  # no raise
    collided = spark.createDataFrame(
        [(1, "https://a/x"), (1, "https://a/y")], "id long, url string")
    with pytest.raises(RuntimeError, match="collision"):
        _audit_ids(collided)


def test_cc_driver_finish_equals_distributed(spark):
    """The driver-side union-find tail must produce exactly the labels of
    the pure-distributed loop. The random graph needs >1 contraction
    level (hook trees merge through local minima), so the finish path
    actually fires; the long path checks that per-level path compression
    resolves a chain in ONE level (pre-round-4, hooking shortened a
    chain by one edge per level — O(diameter) levels)."""
    import random

    rng = random.Random(13)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges_list = sorted({(min(a, b), max(a, b))
                         for a, b in ((rng.choice(nodes), rng.choice(nodes))
                                      for _ in range(100)) if a != b})
    expect = uf_cc(edges_list)
    edges = spark.createDataFrame(edges_list, "src string, dst string")
    st_e, st_d, st_p = {}, {}, {}
    # entry short-circuit: the whole graph fits the driver budget
    entry = {r.node: r.cluster_id for r in cluster.connected_components(
        edges, stats=st_e, driver_finish_edges=1000).collect()}
    # mid-loop tail: initial graph exceeds the budget, the contracted
    # one does not
    with_finish = {r.node: r.cluster_id for r in cluster.connected_components(
        edges, stats=st_d, driver_finish_edges=len(edges_list) - 1).collect()}
    pure = {r.node: r.cluster_id for r in cluster.connected_components(
        edges, stats=st_p, driver_finish_edges=0).collect()}
    assert entry == with_finish == expect == pure
    assert st_e["driver_finish"] is True and st_e["levels"] == 0
    assert st_e["input_edges"] == len(edges_list)
    assert st_d["driver_finish"] is True and st_d["levels"] >= 1
    assert st_p["driver_finish"] is False
    # the driver finish must have cut levels vs the pure loop
    assert st_d["levels"] <= st_p["levels"]
    # levels counts DISTRIBUTED contraction levels only; the driver-finish
    # tail shows up in mappings (comparable metric across on/off runs)
    assert st_e["mappings"] == 1
    assert st_d["mappings"] == st_d["levels"] + 1
    assert st_p["mappings"] == st_p["levels"]

    # chain component: one level, no O(diameter) blowup
    path = [(f"p{i:03d}", f"p{i+1:03d}") for i in range(60)]
    st = {}
    got = {r.node: r.cluster_id for r in cluster.connected_components(
        spark.createDataFrame(path, "src string, dst string"),
        stats=st, driver_finish_edges=0).collect()}
    assert got == uf_cc(path)
    assert st["levels"] == 1


def test_candidate_pairs_hybrid_star(spark):
    """Hybrid mode: blocks <= K emit full cliques, blocks > K emit exactly
    the dual (min-id, max-id) hub stars; canonical id_a < id_b holds
    everywhere; clique mode is the exhaustive superset."""
    grouped = spark.createDataFrame(
        [(1, [30, 10, 20]),                    # small: clique
         (2, [9, 3, 7, 5, 1])],                # big (K=3): stars around 1, 9
        "block_key long, ids array<long>")
    clique = {(r.id_a, r.id_b) for r in
              cand.candidate_pairs(grouped, keep_block_key=False).collect()}
    hybrid = {(r.id_a, r.id_b) for r in
              cand.candidate_pairs(grouped, keep_block_key=False,
                                   star_min_block=3).collect()}
    assert hybrid == {(10, 20), (10, 30), (20, 30),        # clique block
                      (1, 3), (1, 5), (1, 7), (1, 9),      # min-hub star
                      (3, 9), (5, 9), (7, 9)}              # max-hub star
    assert hybrid < clique
    assert all(a < b for a, b in hybrid)
    # transitive closure over an all-match big block is identical either
    # way: the hub connects every member
    edges = spark.createDataFrame(sorted(hybrid), "src long, dst long")
    labels = {r.node: r.cluster_id
              for r in cluster.connected_components(edges).collect()}
    assert {labels[x] for x in (1, 3, 5, 7, 9)} == {1}


def test_hot_key_presalt_bounds_rows_and_conserves_members(spark):
    """The hot-key guard must (a) split a pathological hot key row-level so
    no grouped row holds the whole block, (b) never drop a member, and
    (c) report the hot key in salt metrics. Cold keys pass through
    untouched (identical grouped output)."""
    hot_n, max_block, hot_bound = 20_000, 64, 2_048
    rows = ([(777, i) for i in range(hot_n)]          # one pathological key
            + [(10, 1), (10, 2), (10, 3), (11, 5), (11, 6)])  # cold keys
    blocks = spark.createDataFrame(rows, "block_key long, id long")
    kept, metrics = blocking.prune_blocks(blocks, max_block=max_block,
                                          hot_bound=hot_bound)
    got = kept.select("ids").collect()
    # (a): the largest grouped row is ~max_block, far below the hot key's
    # 20k members (hash placement is statistical, hence the 4x slack)
    assert max(len(r["ids"]) for r in got) <= 4 * max_block
    # (b): exact member conservation — 20,000 hot + 5 cold. (Sub-blocks
    # average ~max_block members, so the HAVING>1 singleton filter cannot
    # realistically drop any; deterministic hashing makes this stable.)
    assert sum(len(r["ids"]) for r in got) == hot_n + 5
    # (c): the hot key is REPORTED in salt metrics with its estimated size
    assert any(r["block_size"] >= hot_bound for r in metrics.collect())
    # cold keys untouched: both cold blocks present with full member sets
    cold = {tuple(sorted(r["ids"])) for r in got if len(r["ids"]) <= 3}
    assert (1, 2, 3) in cold and (5, 6) in cold


def test_hot_key_presalt_accepts_string_keys(spark):
    """prune_blocks(hot_bound=...) is a generic API: a string-keyed block
    stream (e.g. experimental band keys) must pre-salt without the long
    coercion the pipeline's surrogate keys allow — the broadcast hot-key
    frame reuses the stream's own key type."""
    hot_n, max_block, hot_bound = 8_000, 32, 1_024
    rows = ([("band:hot", i) for i in range(hot_n)]
            + [("band:cold", 1), ("band:cold", 2)])
    blocks = spark.createDataFrame(rows, "block_key string, id long")
    kept, metrics = blocking.prune_blocks(blocks, max_block=max_block,
                                          hot_bound=hot_bound)
    got = kept.select("ids").collect()
    assert max(len(r["ids"]) for r in got) <= 4 * max_block
    assert sum(len(r["ids"]) for r in got) == hot_n + 2
    assert any(r["block_size"] >= hot_bound for r in metrics.collect())


def test_star_mode_clusters_equal_clique(spark, tiny_pages_dir):
    """The shipped default (dual-hub star pruning) must label every url
    exactly as exhaustive-clique mode does on the test corpus: transitive
    closure restores any in-block pair the star pruned (the inv_star_clusters
    oracle contract)."""
    from dedupe_rust_spark.plans.pipeline import PipelineConfig

    star = DedupPipeline(spark, tiny_pages_dir, config=PipelineConfig(
        checkpoints=False)).run()
    clique = DedupPipeline(spark, tiny_pages_dir, config=PipelineConfig(
        checkpoints=False, star_min_block=None)).run()
    assert star.exceptAll(clique).count() == 0
    assert clique.exceptAll(star).count() == 0


def test_blocks_salted_not_silent(spark, sig):
    reps = blocking.exact_representatives(sig)
    blocks = blocking.all_blocks(reps)
    kept, cap_metrics = blocking.prune_blocks(blocks, max_block=2)
    # with a tiny limit, salted blocks MUST be reported
    assert cap_metrics.count() > 0
    # no ids dropped: salting repartitions members, never discards them
    multi_rows = (blocks.groupBy("block_key").count()
                  .filter(F.col("count") > 1)
                  .agg(F.sum("count")).first()[0])
    members = kept.agg(F.sum(F.size("ids"))).first()[0]
    assert members == multi_rows
    # hash salting bounds sub-block size statistically, not exactly; with
    # this seed-fixed corpus the worst sub-block stays near the target
    assert kept.agg(F.max(F.size("ids"))).first()[0] <= 4 * 2


# ------------------------------------------------------------------ resume
def test_resume_skips_completed_stages(spark, tiny_pages_dir, tmp_path):
    out = str(tmp_path / "out")
    p1 = DedupPipeline(spark, tiny_pages_dir, out_dir=out, run_id="R1")
    c1 = p1.run().toPandas().sort_values("url").reset_index(drop=True)
    p2 = DedupPipeline(spark, tiny_pages_dir, out_dir=out, run_id="R1")
    c2 = p2.run().toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c2)
    resumed = [m for m in p2.stage_metrics if m.get("resumed")]
    assert any(m["stage"] == "signatures" for m in resumed)
    assert any(m["stage"] == "candidates" for m in resumed)


def test_resume_invalidated_by_config_change(spark, tiny_pages_dir, tmp_path):
    """Same run_id + different thresholds must NOT reuse stale checkpoints
    (scores bake in is_match): the config fingerprint keys the path."""
    from dedupe_rust_spark.plans.pipeline import PipelineConfig

    out = str(tmp_path / "out")
    p1 = DedupPipeline(spark, tiny_pages_dir, out_dir=out, run_id="RC")
    p1.run()
    p2 = DedupPipeline(spark, tiny_pages_dir, out_dir=out, run_id="RC",
                       config=PipelineConfig(lev_match=0.5))
    p2.run()
    assert p1.cfg_fingerprint != p2.cfg_fingerprint
    assert not [m for m in p2.stage_metrics if m.get("resumed")]


def test_fast_path_equals_checkpointed(spark, tiny_pages_dir):
    """checkpoints=False (throughput fast path) must produce identical
    clusters to the default checkpointed path."""
    from dedupe_rust_spark.plans.pipeline import PipelineConfig

    slow = DedupPipeline(spark, tiny_pages_dir).run()
    fast = DedupPipeline(spark, tiny_pages_dir,
                         config=PipelineConfig(checkpoints=False)).run()
    assert slow.exceptAll(fast).count() == 0
    assert fast.exceptAll(slow).count() == 0


def test_write_report_golden_shape(spark, tiny_pages_dir, tmp_path):
    pipe = DedupPipeline(spark, tiny_pages_dir, out_dir=str(tmp_path),
                         run_id="RPT")
    clusters = pipe.run()
    report = pipe.write_report(clusters)
    assert report["total_groups"] == report["groups_inlined"] > 0
    assert len(report["groups"]) == report["groups_inlined"]
    for g in report["groups"][:20]:
        assert g["urls"] == sorted(g["urls"]) and g["n"] == len(g["urls"]) >= 2
    # groups sorted by first member (reference main.rs:310-315)
    firsts = [g["urls"][0] for g in report["groups"]]
    assert firsts == sorted(firsts)
    import os
    assert os.path.exists(str(tmp_path / "dedupe_report_RPT.json"))
    # the driver collect is bounded: a tiny cap inlines only that many
    capped = pipe.write_report(clusters, max_inline_groups=3)
    assert capped["groups_inlined"] == len(capped["groups"]) == 3
    assert capped["total_groups"] == report["total_groups"]
