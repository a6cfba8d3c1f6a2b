"""Candidate pair generation: block self-join (reference analog B1).

The reference's group-by-hash is the degenerate form of this equi
self-join (/root/reference/src/main.rs:488-498). `id_a < id_b` removes
the diagonal and symmetric pairs; dropDuplicates collapses pairs found by
multiple bands (UNION+DISTINCT, SURVEY.md §2.1 set ops).

Pairs are (id_a, id_b) LONGS — the surrogate keys assigned at the
signature stage — so the pair-dedup shuffle and every downstream join
moves 16 bytes of key per row instead of two url strings (~120-160 B).
urls are joined back once at cluster output.

Scale: the join shuffles on block_key; AQE skew-join splits hot keys.
An optional SimHash prefilter (hamming <= threshold via xor+bit_count,
all JVM-side) cheaply kills low-similarity pairs before pandas scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SIMHASH_HAMMING_MAX = 24
# SimHash over few shingles is high-variance: a single edit in a short doc
# flips many bits. Pairs where either text is shorter than this bypass the
# prefilter and go straight to exact scoring.
SHORT_TEXT_BYPASS = 300


def candidate_pairs(grouped: DataFrame, keep_block_key: bool = True
                    ) -> DataFrame:
    """Grouped blocks (block_key, ids array) -> distinct (id_a, id_b) pairs.

    Pair generation is two nested explodes over each block's id array —
    exactly m(m-1)/2 generated rows per block, all inside one codegen
    stage, versus a block_key equi self-join's extra exchange + m^2
    probed rows. The only shuffle here is the final pair dedup
    (dropDuplicates), which is irreducible for multi-band LSH: a near-dup
    pair is found by up to 32 bands, so the pre-dedup stream is many
    times the distinct-pair count — which is why rows are two longs and
    keep_block_key=False drops the key before that shuffle (the retained
    key of a multi-band pair is arbitrary anyway)."""
    a = grouped.select(
        "block_key", F.explode("ids").alias("id_a"), "ids"
    )
    pairs = a.select(
        "block_key", "id_a",
        F.explode(F.filter("ids", lambda y: y > F.col("id_a"))).alias("id_b"),
    )
    if keep_block_key:
        return pairs.select("id_a", "id_b", "block_key").dropDuplicates(
            ["id_a", "id_b"])
    return pairs.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])


def simhash_prefilter(pairs: DataFrame, sig: DataFrame,
                      max_hamming: int = SIMHASH_HAMMING_MAX,
                      short_bypass: int = SHORT_TEXT_BYPASS) -> DataFrame:
    """Join simhashes onto pairs and keep hamming(sim_a, sim_b) <= max.
    bit_count(a XOR b) is a codegen'd JVM expression — no Python.
    Short texts bypass the filter (see SHORT_TEXT_BYPASS)."""
    sh = sig.select("id", "simhash", "n_chars")
    out = (
        pairs
        .join(sh.withColumnsRenamed(
            {"id": "id_a", "simhash": "_sa", "n_chars": "_na"}), "id_a")
        .join(sh.withColumnsRenamed(
            {"id": "id_b", "simhash": "_sb", "n_chars": "_nb"}), "id_b")
        .withColumn("_ham", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter((F.col("_ham") <= max_hamming)
                | (F.least("_na", "_nb") < short_bypass))
        .drop("_sa", "_sb", "_ham", "_na", "_nb")
    )
    return out
