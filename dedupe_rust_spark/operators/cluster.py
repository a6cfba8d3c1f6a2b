"""Connected components over the match-edge DataFrame (north-rule C1).

The reference never needs CC: hash-equality matching is transitive, so
groups are clusters (/root/reference/src/main.rs:616-624). Fuzzy matching
breaks transitivity, hence transitive closure here.

Algorithm: hash-to-min label propagation with pointer jumping —
each round every node takes min(own label, neighbors' labels), then labels
chase their own label's label (doubling). Converges in O(log d) rounds for
diameter d; dedup clusters are near-cliques so 2-4 rounds in practice.
`localCheckpoint()` per round truncates lineage (SURVEY.md §4.3.2); the
convergence check is a changed-label count.

The node type is whatever the edge columns carry — the pipeline feeds
8-byte surrogate ids (longs), so every CC round shuffles longs; url
strings are joined back exactly once, after the loop, in
propagate_to_members.

No GraphFrames dependency — plain joins + groupBy, shuffle-partitioned on
the node key throughout so successive rounds reuse the hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(src,dst) -> labels(node, cluster_id), cluster_id = min member
    (by the node type's ordering — longs for the pipeline's surrogate ids).

    Only nodes that appear in an edge are returned (singletons are added by
    the caller if desired).
    """
    # materialize the edge list once: the symmetrizing union below consumes
    # it twice, and its lineage may carry the whole scoring UDF chain
    edges.sparkSession.sparkContext.setJobDescription("cc:edges")
    edges = edges.localCheckpoint()
    edges.sparkSession.sparkContext.setJobDescription("cc:sym")
    # sym is the per-round join probe side and the largest CC table (2x
    # match edges; near-clique clusters make it quadratic in cluster
    # size). localCheckpoint materializes it once; each round's join then
    # re-exchanges it by node — measured, that costs LESS than the
    # alternative of cache()-with-repartition("node"): under AQE the
    # cached relation's partitioning is not reused by the outer joins, so
    # every reference re-exchanged the cached data (8 sym-sized exchange
    # writes per double round vs 2 with the checkpoint).
    sym = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .union(edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr")))
        .distinct()
        .localCheckpoint()
    )
    # seed labels with the first neighbor-min half-round fused in:
    # label0(x) = min(x, min(neighbors)) — one agg instead of a distinct
    # node list + a union + the first propagation join (fewer serial jobs;
    # the CC loop's job count is its local-mode latency floor)
    edges.sparkSession.sparkContext.setJobDescription("cc:seed")
    labels = sym.groupBy("node").agg(
        F.least(F.col("node"), F.min("nbr")).alias("label")
    ).localCheckpoint()
    edges.sparkSession.sparkContext.setJobDescription("cc:rounds")

    def one_round(lab: DataFrame) -> DataFrame:
        # 1. neighbor-min: candidate label for each node from its neighbors
        nbr_labels = (
            sym.join(lab, on="node")
            .select(F.col("nbr").alias("node"), "label")
        )
        new_labels = (
            lab.unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # 2. pointer jumping: label <- label(label) when it exists
        lab2 = new_labels.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        return (
            new_labels.join(lab2, on="label", how="left")
            .select("node", F.coalesce("label2", "label").alias("label"))
        )

    # Two propagation rounds per materialization: the plan for both rounds
    # compiles into one job at the checkpoint, halving per-round scheduling
    # latency; convergence is checked on the materialized result.
    for _ in range(max_iter // 2):
        jumped = one_round(one_round(labels)).localCheckpoint()
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("cluster_id"))


def propagate_to_members(rep_labels: DataFrame, ex_map: DataFrame,
                         id_urls: DataFrame) -> DataFrame:
    """Combine fuzzy CC labels over representatives with exact groups and
    join urls back — the ONE place the fuzzy path touches url strings.

    rep_labels: (node=id, cluster_id=id-label) from connected_components
    over representative ids.
    ex_map: (id, root_id) from blocking.exact_group_map — root_id is the
    exact-group min-url member's id AND the representative that entered
    fuzzy blocking.
    id_urls: (id, url) projection of the signatures table.

    Label id per url = CC label of its root if the root was fuzzy-matched,
    else the root itself; the label is then REWRITTEN to min(url) of the
    cluster (hash agg + join — no window sort) so the output contract
    (cluster_id = lexicographic min member url, reference main.rs:310-315)
    is independent of how ids order. Urls whose final cluster has a single
    member are dropped (duplicate groups have >= 2, main.rs:418-421).
    """
    root_label = ex_map.select(F.col("root_id").alias("node")).distinct().join(
        rep_labels.withColumnsRenamed({"cluster_id": "_cc"}), "node", "left"
    ).select(F.col("node").alias("root_id"),
             F.coalesce("_cc", "node").alias("label_id"))
    labeled = (
        ex_map.join(root_label, "root_id")
        .join(id_urls, "id")
        .select("url", "label_id")
    )
    # one aggregation computes the min-url label AND the >=2-member filter
    groups = (
        labeled.groupBy("label_id")
        .agg(F.min("url").alias("cluster_id"), F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .select("label_id", "cluster_id")
    )
    return labeled.join(groups, "label_id").select("url", "cluster_id")


def clusters_with_members(labels: DataFrame) -> DataFrame:
    """clusters report rows: (cluster_id, urls sorted, n) — reference
    output analog (DuplicateGroup, main.rs:38-42; sorted members 630)."""
    return (
        labels.groupBy("cluster_id")
        .agg(F.sort_array(F.collect_list("url")).alias("urls"),
             F.count("*").alias("n"))
        .orderBy("cluster_id")
    )
