"""Connected components over the match-edge DataFrame (north-rule C1).

The reference never needs CC: hash-equality matching is transitive, so
groups are clusters (/root/reference/src/main.rs:616-624). Fuzzy matching
breaks transitivity, hence transitive closure here.

Algorithm: LABEL CONTRACTION (the alternating-star family of MapReduce CC
algorithms recast as levels of graph contraction). Each level labels every
node with min(self, neighbors) — a valid partial contraction, since a
node's label is itself or an adjacent node — then rebuilds the edge set
BETWEEN LABELS and recurses on the contracted graph. Final labels compose
the per-level mappings coarse-to-fine.

Why contraction instead of round-2's hash-to-min + pointer jumping: dedup
components are near-cliques, so the first min-labeling collapses almost
everything and the level-1 contracted graph is tiny — per-level shuffle
volume is ~6|E_level| and |E| drops by orders of magnitude after level 0,
where hash-to-min re-propagated over the FULL symmetrized edge table every
round (~16|E| total with the confirmation round). At 400k pages the CC
stage was the largest shuffle producer in the pipeline; contraction
roughly halves it. Convergence in O(log d) levels for diameter d (paths
halve per level); the termination check is an isEmpty on the materialized
contracted edge set, not an extra propagation round.

Correctness invariants (tested against a union-find oracle and under
repartitioning): (1) same-label nodes are connected (label ∈ {self} ∪
neighbors); (2) the contracted graph of a connected component is
connected, so a component never terminates with two labels; (3) the
component minimum always labels itself, so the terminal label IS the
minimum member — cluster_id = min member id, deterministically.

The node type is whatever the edge columns carry — the pipeline feeds
8-byte surrogate ids (longs), so every CC level shuffles longs; url
strings are joined back exactly once, after the loop, in
propagate_to_members.

No GraphFrames dependency — plain joins + groupBy;
`localCheckpoint()` per level truncates lineage (SURVEY.md §4.3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, max_iter: int = 25,
                         stats: dict | None = None) -> DataFrame:
    """edges(src,dst) -> labels(node, cluster_id), cluster_id = min member
    (by the node type's ordering — longs for the pipeline's surrogate ids).

    Only nodes that appear in an edge are returned (singletons are added by
    the caller if desired). Pass `stats` to receive {"levels": k} — the
    number of contraction levels actually run (the scale-rehearsal metric:
    levels grow O(log diameter), so a jump flags a structural change in
    the match graph, not just more data).
    """
    sc = edges.sparkSession.sparkContext
    # materialize the edge list once: its lineage may carry the whole
    # scoring UDF chain, and each level consumes it three times
    sc.setJobDescription("cc:edges")
    cur = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )
    mappings: list[DataFrame] = []
    for level in range(max_iter):
        sc.setJobDescription(f"cc:level{level}")
        sym = cur.select(
            F.col("src").alias("node"), F.col("dst").alias("nbr")
        ).union(cur.select(
            F.col("dst").alias("node"), F.col("src").alias("nbr")))
        # min(self, neighbors): the level's contraction mapping. No
        # distinct on sym — duplicate (node, nbr) rows cannot change a min.
        lab = sym.groupBy("node").agg(
            F.least(F.col("node"), F.min("nbr")).alias("label")
        ).localCheckpoint()
        mappings.append(lab)
        nxt = (
            cur.join(lab.withColumnsRenamed(
                {"node": "src", "label": "_ls"}), "src")
            .join(lab.withColumnsRenamed(
                {"node": "dst", "label": "_ld"}), "dst")
            .select(F.col("_ls").alias("src"), F.col("_ld").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        cur = nxt
    if stats is not None:
        stats["levels"] = len(mappings)
    # compose coarse-to-fine: final(node) = m_k(... m_1(node)). Labels
    # absent from the coarser map (their component already terminal) pass
    # through via the left join + coalesce.
    sc.setJobDescription("cc:compose")
    final = mappings[-1]
    for lab in reversed(mappings[:-1]):
        coarse = final.select(F.col("node").alias("label"),
                              F.col("label").alias("_l2"))
        final = (
            lab.join(coarse, "label", "left")
            .select("node", F.coalesce("_l2", "label").alias("label"))
            .localCheckpoint()
        )
    sc.setJobDescription(None)
    return final.select("node", F.col("label").alias("cluster_id"))


def propagate_to_members(rep_labels: DataFrame, ex_map: DataFrame,
                         id_urls: DataFrame) -> DataFrame:
    """Combine fuzzy CC labels over representatives with exact groups and
    join urls back — the ONE place the fuzzy path touches url strings.

    rep_labels: (node=id, cluster_id=id-label) from connected_components
    over representative ids.
    ex_map: (id, root_id) from blocking.exact_group_map — root_id is the
    exact-group min-id member AND the representative that entered fuzzy
    blocking (min(id) keeps the roots agg a true HashAggregate; the
    min-URL output contract is applied below, not at root selection).
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
