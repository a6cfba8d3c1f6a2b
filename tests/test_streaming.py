"""Incremental (Structured Streaming) dedup test: two waves of pages;
the second wave contains exact copies of the first and must be flagged."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from dedupe_rust_spark.datagen import _PA_PAGES, EPOCH
from dedupe_rust_spark.functions.textcore import render_html
from dedupe_rust_spark.streaming.incremental import start_incremental_dedup


def _write_wave(path: str, rows: list[tuple[str, bytes]]) -> None:
    tbl = pa.Table.from_pylist(
        [
            {"url": u, "warc_ts": EPOCH, "html": h,
             "text": None, "lang": "en"}
            for u, h in rows
        ],
        schema=_PA_PAGES,
    )
    pq.write_table(tbl, path)


def test_incremental_dedup_two_waves(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    matches_dir = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    doc_a = render_html("Title A", ["unique body alpha " * 5])
    doc_b = render_html("Title B", ["unique body beta " * 5])
    _write_wave(os.path.join(input_dir, "wave1.parquet"),
                [("https://h1.example.com/a.html", doc_a),
                 ("https://h1.example.com/b.html", doc_b)])

    q = start_incremental_dedup(spark, input_dir, state_dir, matches_dir, ckpt)
    q.awaitTermination(120)

    # wave 2: one dup of doc_a, one new doc
    doc_c = render_html("Title C", ["unique body gamma " * 5])
    _write_wave(os.path.join(input_dir, "wave2.parquet"),
                [("https://h2.example.com/a-copy.html", doc_a),
                 ("https://h2.example.com/c.html", doc_c)])

    q2 = start_incremental_dedup(spark, input_dir, state_dir, matches_dir, ckpt)
    q2.awaitTermination(120)

    matches = spark.read.parquet(matches_dir).toPandas()
    assert len(matches) == 1
    assert matches.iloc[0]["url"] == "https://h2.example.com/a-copy.html"
    assert matches.iloc[0]["first_url"] == "https://h1.example.com/a.html"

    state = spark.read.option("basePath", state_dir).parquet(state_dir)
    assert state.count() == 4  # all four pages signed into state

    # state is sharded by sha_prefix: a prefix-restricted read must prune
    # to only that shard's files (the at-scale join pruning surface)
    import pyspark.sql.functions as F
    one_prefix = state.select("sha_prefix").first()[0]
    pruned = state.filter(F.col("sha_prefix") == one_prefix)
    assert pruned.count() >= 1
    # input_file_name() reflects the files the pruned scan actually read
    files = [r[0] for r in
             pruned.select(F.input_file_name()).distinct().collect()]
    assert files and all(f"sha_prefix={one_prefix}" in f for f in files)

    # idempotency: re-running the stream over the same checkpoint (no new
    # input) must not append duplicate match or state rows
    q3 = start_incremental_dedup(spark, input_dir, state_dir, matches_dir,
                                 ckpt)
    q3.awaitTermination(120)
    assert len(spark.read.parquet(matches_dir).toPandas()) == 1
    assert spark.read.option("basePath",
                             state_dir).parquet(state_dir).count() == 4
