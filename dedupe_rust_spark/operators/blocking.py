"""Blocking: exact-key + MinHash-LSH band keys, with hot-block control.

Reference analog: grouping by (ext, width, height) then by cheap hash
(/root/reference/src/main.rs:365-435, 488-498). Generalized per the north
rule to LSH banding over MinHash signatures plus exact-signature keys.

Scale design (100 TB):
  * Everything downstream of the signature stage is keyed by the 8-byte
    surrogate `id` (xxhash64(url), operators/signatures.py) — band rows,
    candidate pairs, and CC rounds shuffle longs, not url strings.
  * Exact duplicates are collapsed BEFORE fuzzy blocking: one representative
    per text_sha256 enters LSH. A boilerplate page copied 10^6 times would
    otherwise explode one band bucket into 10^12 candidate pairs; after
    collapse it is ONE row. This mirrors the reference's cascade (cheap
    equality before expensive compare) and is the single biggest pair-count
    lever.
  * The exact-group operators are HASH AGGREGATIONS (groupBy + min_by +
    join), not windows: a window would shuffle AND SORT every signature row
    per text_sha256 — one avoidable corpus sort at 100 TB. The agg is
    map-side combinable and the join back is a plain hash join.
  * Remaining oversized blocks (distinct texts sharing a band, power-law
    boilerplate) are capped at max_block_size by deterministic hash salting
    and the overflow is COUNTED, never silently dropped — callers read
    `blocks_capped` metrics. Near-dup recall for capped blocks is preserved
    by the other 31 bands: the salt hash includes the block key, so two
    bands containing the same pair split it INDEPENDENTLY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_MAX_BLOCK = 512


def exact_representatives(sig: DataFrame) -> DataFrame:
    """One row per distinct text_sha256 (min url wins — deterministic).

    groupBy + min_by(struct, url) is a hash aggregation: no sort, partial
    agg map-side (each task keeps one candidate row per local sha). The
    round-2 row_number() window sorted every signature row per key.
    """
    cols = sig.columns
    return (
        sig.groupBy("text_sha256")
        .agg(F.min_by(F.struct(*cols), F.col("url")).alias("_rep"))
        .select(*[F.col(f"_rep.{c}").alias(c) for c in cols])
    )


def exact_group_map(sig: DataFrame) -> DataFrame:
    """(id, root_id) where root_id = id of the min-url member of the
    identical-text group (root_id == id for unique texts). The root is also
    the representative that entered fuzzy blocking, so fuzzy cluster labels
    propagate to all exact copies with ONE join — exact-dup stars never
    enter the CC loop (a boilerplate page with 10^6 copies would otherwise
    drag a 10^6-arm star through every iteration)."""
    roots = sig.groupBy("text_sha256").agg(
        F.min_by("id", "url").alias("root_id")
    )
    return (
        sig.select("id", "text_sha256")
        .join(roots, "text_sha256")
        .select("id", "root_id")
    )


def exact_edges(sig: DataFrame) -> DataFrame:
    """Star edges url -> min(url) within each identical-text group
    (url-typed: test/oracle surface, not the hot path — the pipeline
    propagates exact groups via exact_group_map ids instead).

    Equality is transitive so a star is enough for CC — the reference
    relies on the same property (groups ARE clusters, main.rs:616-624).
    """
    roots = sig.groupBy("text_sha256").agg(F.min("url").alias("_root"))
    return (
        sig.select("url", "text_sha256")
        .join(roots, "text_sha256")
        .filter(F.col("url") != F.col("_root"))
        .select(F.col("_root").alias("src"), F.col("url").alias("dst"))
    )


def lsh_blocks(reps: DataFrame) -> DataFrame:
    """Explode precomputed LSH band keys -> (block_key, id). block_key is
    'band_index:band_hash' so different bands never collide. Pure JVM:
    the band keys were computed inside the signature UDF pass."""
    bands = reps.select(
        "id",
        F.posexplode(F.col("bands")).alias("band_id", "band_hash"),
    )
    return bands.select(
        F.concat_ws(":", F.col("band_id"), F.col("band_hash")).alias("block_key"),
        "id",
    )


def title_blocks(reps: DataFrame) -> DataFrame:
    """Exact key on (host, first text line): near-dups overwhelmingly share
    their title, and LSH recall sags near the decision boundary. Analog of
    the reference's secondary exact key (ext within dimension groups,
    main.rs:376). All built-in expressions — stays in codegen."""
    first_line = F.substring_index(F.col("text"), "\n", 1)
    return reps.select(
        F.concat_ws(":", F.lit("T"),
                    F.xxhash64(F.col("host"), first_line).cast("string")
                    ).alias("block_key"),
        "id",
    )


def all_blocks(reps: DataFrame) -> DataFrame:
    """Union of LSH band keys and host+title exact keys (UNION set op,
    SURVEY.md §2.1); candidate dedup happens after the self-join."""
    return lsh_blocks(reps).unionByName(title_blocks(reps))


def prune_blocks(blocks: DataFrame, max_block: int = DEFAULT_MAX_BLOCK
                 ) -> tuple[DataFrame, DataFrame]:
    """Drop singleton blocks (HAVING count>1, reference main.rs:418-421) and
    SALT oversized ones: a block of size m > max_block is split
    deterministically (by hash of block_key AND id) into ceil(m/max_block)
    sub-blocks, so no row is dropped but per-block pair count stays
    O(max_block^2) (statistical bound — hash placement, not rank balancing).
    The block key participates in the salt hash so the SAME pair lands in
    DIFFERENT sub-blocks across different oversized bands — a salt keyed on
    id alone would split every band identically and could separate a pair
    in all 32 bands at once. Cross-sub-block pairs of a salted block are
    thus recovered by the other bands / title key with high probability.
    Returns (salted_blocks, salt_metrics) — every salted block is REPORTED,
    never silent (SURVEY.md §4.3.1).

    Scale shape: block sizes come from a map-side-combinable groupBy (tiny
    result, one row per multi-member key) joined back onto the band stream
    — AQE broadcasts it, so the band rows are never shuffled OR sorted
    here; the only full shuffle of band rows is the candidate self-join.
    (Round-1 used two windows — count + row_number — which sorted every
    band row per key and capped candidate-stage scaling at ~2.6x/4.)"""
    # blocks is consumed twice (size agg + join) and its lineage carries the
    # representative agg + band explode; materialize it once (lazy: the
    # first action computes it, every later consumer reads the cached rows)
    blocks = blocks.localCheckpoint(eager=False)
    sizes = (
        blocks.groupBy("block_key")
        .agg(F.count("*").alias("_sz"))
        .filter(F.col("_sz") > 1)
    )
    multi = blocks.join(sizes, "block_key")
    n_salts = F.ceil(F.col("_sz") / F.lit(max_block)).cast("long")
    salted = multi.select(
        F.when(
            F.col("_sz") <= max_block, F.col("block_key")
        ).otherwise(
            F.concat_ws("#", F.col("block_key"),
                        F.pmod(F.xxhash64("block_key", "id"),
                               n_salts).cast("string"))
        ).alias("block_key"),
        "id",
    )
    salt_metrics = sizes.filter(F.col("_sz") > max_block).select(
        "block_key",
        F.col("_sz").alias("block_size"),
        F.lit(max_block).alias("salt_target"),
    )
    return salted, salt_metrics
