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
  3. appends the batch signatures to the state.
foreachBatch (not a stateful operator) because the state table must be
shared with the batch pipeline and survive restarts; the streaming
checkpoint makes each batch exactly-once at the sink level.

`trigger(availableNow=True)` drains the backlog and stops — used in tests;
a production run drops the trigger for continuous micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.signatures import extract, signatures
from ..schemas import PAGES
from ..sources.pages import clean_pages

SIG_STATE_COLS = ["url", "host", "lang", "text_sha256", "n_chars"]


def _state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    if os.path.exists(os.path.join(state_dir, "_SUCCESS")) or (
        os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for f in os.listdir(state_dir))
    ):
        return spark.read.parquet(state_dir)
    return None


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
            .localCheckpoint()  # batch_df is single-use; state join re-reads
        )
        prev = _state(spark, state_dir)
        if prev is not None:
            seen = prev.groupBy("text_sha256").agg(
                F.min("url").alias("first_url")
            )
            matches = (
                sig.join(seen, "text_sha256")
                .filter(F.col("url") != F.col("first_url"))
                .select("url", "first_url", "text_sha256",
                        F.lit(batch_id).alias("batch_id"))
            )
            matches.write.mode("append").parquet(matches_dir)
        else:
            # still create the sink dir so readers never race
            spark.createDataFrame(
                [], "url string, first_url string, text_sha256 string, "
                    "batch_id long"
            ).write.mode("append").parquet(matches_dir)
        sig.write.mode("append").parquet(state_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
