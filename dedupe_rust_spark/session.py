"""SparkSession factory with scale-oriented defaults.

Local mode here; on a real cluster the same configs apply (AQE, Arrow,
skew-join) — only master/memory change via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "dedupe_rust_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local: match cores. Cluster: ~2-3x total executor cores, or let
        # AQE coalesce from a higher initial number.
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # UI off by default (bench JVMs are throwaway); SPARK_GRAFT_UI=1
        # turns it on so bench.py can read per-stage shuffle bytes from the
        # REST API (the auditable metric behind BENCH/BASELINE.md).
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false")
        # bench sums shuffle bytes over COMPLETED stages via the REST API;
        # the default retainedStages=1000 silently evicts early stages
        # across multi-lap runs and the cumulative totals shrink. Retain
        # enough for a full bench session (stage metadata is tiny).
        .config("spark.ui.retainedStages", "20000")
        .config("spark.ui.retainedJobs", "20000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Local-mode shuffle goes through spark.local.dir; on this sandbox the
    # default /tmp is disk-backed and becomes the critical path at high
    # parallelism. Use tmpfs when present (a real cluster uses NVMe +
    # network shuffle service instead).
    shm = "/dev/shm/spark_local"
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
