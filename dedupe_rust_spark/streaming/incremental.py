"""Incremental dedup over a stream of newly-crawled pages.

The reference is one-shot batch (SURVEY.md §2.1: no streaming); a
continuously-fed crawl wants the same semantics incrementally: as new pages
arrive, find which are duplicates of anything already seen, and extend the
seen-signature state.

Design: Structured Streaming file source -> foreachBatch. Each micro-batch
  1. extracts + signs the new pages (same UDFs as batch — identical
     semantics by construction),
  2. joins the batch's text_sha256 against the persistent signature state
     (parquet dir; Iceberg table on a real cluster) to emit match edges
     (new_url -> first seen url with identical text),
  3. writes the batch signatures into the state.
foreachBatch (not a stateful operator) because the state table must be
shared with the batch pipeline and survive restarts.

Delivery semantics: both sinks are written as `batch_id=N` partition
directories with mode("overwrite") scoped to that directory — a micro-batch
retried after a partial failure REWRITES its own partition instead of
appending duplicates, so the sink contents are idempotent per batch
(effectively exactly-once at the directory level). A plain append here
would be at-least-once: retries double match rows and double-count state.

State layout: partitioned by `sha_prefix` (first hex char of text_sha256,
16 shards) under each batch directory. At scale the per-batch match join
co-partitions on the same prefix (both sides carry it as a join key), and
prefix-restricted reads prune to 1/16 of the state files (asserted in
tests/test_streaming.py) instead of re-scanning everything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.signatures import extract, signatures
from ..schemas import PAGES
from ..sources.pages import clean_pages

SIG_STATE_COLS = ["url", "host", "lang", "text_sha256", "n_chars"]


def _state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Read the accumulated signature state (batch_id=*/sha_prefix=* layout);
    None when no batch has committed state yet."""
    if not os.path.isdir(state_dir):
        return None
    if not any(f.startswith("batch_id=") for f in os.listdir(state_dir)):
        return None
    return spark.read.option("basePath", state_dir).parquet(state_dir)


def start_incremental_dedup(spark: SparkSession, input_dir: str,
                            state_dir: str, matches_dir: str,
                            checkpoint_dir: str, available_now: bool = True):
    """Start the stream; returns the StreamingQuery (caller awaits it)."""
    stream = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sig = (
            signatures(extract(clean_pages(batch_df)))
            .select(*SIG_STATE_COLS)
            .withColumn("sha_prefix", F.substring("text_sha256", 1, 1))
            .localCheckpoint()  # batch_df is single-use; state join re-reads
        )
        prev = _state(spark, state_dir)
        if prev is not None:
            seen = prev.groupBy("sha_prefix", "text_sha256").agg(
                F.min("url").alias("first_url")
            )
            matches = (
                sig.join(seen, ["sha_prefix", "text_sha256"])
                .filter(F.col("url") != F.col("first_url"))
                .select("url", "first_url", "text_sha256")
            )
        else:
            matches = spark.createDataFrame(
                [], "url string, first_url string, text_sha256 string"
            )
        # idempotent per-batch sinks: overwrite THIS batch's partition dir
        matches.write.mode("overwrite").parquet(
            os.path.join(matches_dir, f"batch_id={batch_id}"))
        sig.write.partitionBy("sha_prefix").mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}"))

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
