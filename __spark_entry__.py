"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship exact-dup cluster query at sf0.001.
queries()      — catalog of implemented operators (SURVEY.md §2 ids in names).
oracle_sql()   — DuckDB twins: 36 of 43 queries are value-oracled, including
                 hard invariants for the non-SQL tiers (pipeline exact-
                 containment AND cluster-label values, LSH recall, the
                 shipped star-pruning config's label equality vs clique
                 mode, simhash-dup recall, exact n-gram-Jaccard pair
                 scores, tie-proof ANN/IVF top-k recall, langid accuracy,
                 fingerprint values). The 7 rows-only entries (banded
                 candidates, simhash values + pairs, full pipeline
                 clusters, the three ANN top-k operating points) are each
                 covered by a green invariant twin or pytest oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dedupe_rust_spark.plans.queries import catalog, q_d2_exact_clusters

_QUERIES, _ORACLES = catalog()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_d2_exact_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
