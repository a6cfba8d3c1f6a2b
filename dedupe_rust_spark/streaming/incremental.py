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
The match join reads state STRICTLY OLDER than the current batch
(batch_id < N): a retry of batch N must not see its own failed attempt's
partial state, or min(url) could resolve inside the batch and the retry
would emit different matches than a clean first run.

State layout:
  state_dir/batches/batch_id=N/sha_prefix=H/   fresh per-batch state
  state_dir/compacted/upto=K/sha_prefix=H/     folded batches 0..K
Every `compact_every` batches, process_batch folds all committed batch
dirs (< current batch) plus the previous compacted snapshot into a new
`upto=` snapshot and deletes what it folded — state reads stay O(state),
not O(batches). Readers take ONLY the max `upto=` snapshot, so a crash
between writing a new snapshot and deleting the old one never
double-counts (and duplicates would be harmless anyway: the match join
aggregates min(url) per sha). sha_prefix partitioning (16 shards) lets
prefix-restricted reads prune to 1/16 of the files (asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.signatures import extract, signatures
from ..schemas import PAGES
from ..sources.pages import clean_pages

SIG_STATE_COLS = ["url", "host", "lang", "text_sha256", "n_chars"]
DEFAULT_COMPACT_EVERY = 8


def posix_lister(path: str) -> list[str]:
    """Default directory lister: driver-side os.listdir, correct on POSIX /
    HDFS-like mounts (this sandbox, NFS, fuse). Returns child names, [] if
    the directory does not exist."""
    if not os.path.isdir(path):
        return []
    return os.listdir(path)


def hadoop_lister(spark: SparkSession):
    """Object-store lister: Hadoop FileSystem.listStatus via the session's
    JVM — the swap-in for s3a/gs/abfs state dirs where os.listdir has no
    meaning. Same contract as posix_lister (child names, [] if absent)."""
    def _list(path: str) -> list[str]:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        if not fs.exists(p):
            return []
        return [st.getPath().getName() for st in fs.listStatus(p)]
    return _list


def _batch_ids(state_dir: str, lister=posix_lister) -> list[int]:
    return sorted(int(f.split("=", 1)[1])
                  for f in lister(os.path.join(state_dir, "batches"))
                  if f.startswith("batch_id="))


def _compacted_uptos(state_dir: str, lister=posix_lister) -> list[int]:
    return sorted(int(f.split("=", 1)[1])
                  for f in lister(os.path.join(state_dir, "compacted"))
                  if f.startswith("upto="))


def _state(spark: SparkSession, state_dir: str,
           before_batch: int | None = None,
           lister=posix_lister) -> DataFrame | None:
    """Accumulated signature state: newest compacted snapshot + batch dirs.
    before_batch=N excludes state written by batch N or later — the
    retry-safety contract (a snapshot only ever folds batches < any live
    batch, so snapshots never need the filter)."""
    parts: list[DataFrame] = []
    uptos = _compacted_uptos(state_dir, lister)
    if uptos:
        parts.append(
            spark.read.parquet(
                os.path.join(state_dir, "compacted", f"upto={uptos[-1]}")
            ).select(*SIG_STATE_COLS, "sha_prefix")
        )
    bids = [b for b in _batch_ids(state_dir, lister)
            if before_batch is None or b < before_batch]
    if bids:
        bdir = os.path.join(state_dir, "batches")
        parts.append(
            spark.read.option("basePath", bdir).parquet(
                *[os.path.join(bdir, f"batch_id={b}") for b in bids]
            ).select(*SIG_STATE_COLS, "sha_prefix")
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _compact(spark: SparkSession, state_dir: str, current_batch: int,
             lister=posix_lister) -> None:
    """Fold committed batch dirs (< current_batch) + the previous snapshot
    into compacted/upto=<current_batch-1>, then delete what was folded.
    Idempotent: a retried fold overwrites the same upto dir; readers use
    the MAX upto snapshot so stragglers are ignored until removed."""
    bids = [b for b in _batch_ids(state_dir, lister) if b < current_batch]
    if not bids:
        return
    folded = _state(spark, state_dir, before_batch=current_batch,
                    lister=lister)
    # self-heal: if a previous fold crashed after writing its snapshot but
    # before deleting the folded batch dirs, the next fold reads both.
    # Crash duplicates are FULL-ROW identical (the same batch rows read
    # twice), so dedup on the complete state tuple: a url legitimately
    # re-crawled with different text keeps both (url, text_sha256) rows
    # and future matches against either text stay correct.
    folded = folded.dropDuplicates(SIG_STATE_COLS)
    upto = current_batch - 1
    target = os.path.join(state_dir, "compacted", f"upto={upto}")
    folded.write.partitionBy("sha_prefix").mode("overwrite").parquet(target)
    for b in bids:
        shutil.rmtree(os.path.join(state_dir, "batches", f"batch_id={b}"),
                      ignore_errors=True)
    for u in _compacted_uptos(state_dir, lister):
        if u != upto:
            shutil.rmtree(os.path.join(state_dir, "compacted", f"upto={u}"),
                          ignore_errors=True)


def start_incremental_dedup(spark: SparkSession, input_dir: str,
                            state_dir: str, matches_dir: str,
                            checkpoint_dir: str, available_now: bool = True,
                            compact_every: int = DEFAULT_COMPACT_EVERY,
                            lister=posix_lister):
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
        # pre-batch state only: batch_id < N excludes a failed attempt's
        # own partial writes, so retry output == first-run output
        prev = _state(spark, state_dir, before_batch=batch_id, lister=lister)
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
            os.path.join(state_dir, "batches", f"batch_id={batch_id}"))
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            _compact(spark, state_dir, current_batch=batch_id, lister=lister)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
