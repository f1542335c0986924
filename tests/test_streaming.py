"""Structured-Streaming ingestion: incremental segment append with manifest
lineage, live dictionary aggregate, windowed ingest stats."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark import streaming as st


@pytest.fixture()
def drop_dir(tmp_path, spark):
    """A 'growing' corpus directory with two parquet drops."""
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    d = str(tmp_path / "drops")
    src.filter(F.col("doc_id") < 30).write.parquet(d)
    src.filter(F.col("doc_id") >= 30).write.mode("append").parquet(d)
    return d, src.schema


def test_incremental_index_appends_segments(spark, tmp_path, drop_dir):
    d, schema = drop_dir
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    stream = st.stream_corpus(spark, d, schema, max_files_per_trigger=1)
    st.incremental_index(stream, idx, ckpt, n_buckets=4, range_bits=2)

    epochs = st.ingest.read_stream_manifest(idx)
    assert len(epochs) >= 1
    assert sum(e["n_docs"] for e in epochs) == 60
    seg_root = os.path.join(idx, "segments")
    parts = [p for p in os.listdir(seg_root) if p.startswith("epoch=")]
    assert len(parts) == len(epochs)
    # segments are readable, carry the BLOCK_SCHEMA columns, postings add up
    segs = spark.read.parquet(os.path.join(seg_root, parts[0]))
    assert {"term", "doc_range", "n_docs", "max_u", "doc_bytes"} <= set(segs.columns)


def test_incremental_index_resume_no_reprocess(spark, tmp_path, drop_dir):
    """Restarting the availableNow query on the same checkpoint must not
    reprocess already-committed files (exactly-once per checkpoint)."""
    d, schema = drop_dir
    idx = str(tmp_path / "idx2")
    ckpt = str(tmp_path / "ckpt2")
    st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    n1 = sum(e["n_docs"] for e in st.ingest.read_stream_manifest(idx))
    # restart with no new files → no new epochs with docs
    st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    n2 = sum(e["n_docs"] for e in st.ingest.read_stream_manifest(idx))
    assert n2 == n1 == 60


def test_streaming_term_counts_matches_batch(spark, tmp_path, drop_dir):
    d, schema = drop_dir
    stream = st.stream_corpus(spark, d, schema)
    agg = st.streaming_term_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("live_dict")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["term"], r["cf"]) for r in spark.sql("SELECT * FROM live_dict").collect()
    }
    from searchengine_spark.postings import dictionary, term_frequencies

    batch = spark.read.parquet(d)
    exp = {
        (r["term"], r["cf"])
        for r in dictionary(term_frequencies(batch, "doc_id", "text", use_arrow_udf=False)).collect()
    }
    assert got == exp


def test_streaming_window_stats(spark, tmp_path):
    rows = [
        ("2026-01-01 00:00:01", "alpha beta gamma"),
        ("2026-01-01 00:00:05", "delta words here"),
        ("2026-01-01 00:00:15", "second window row"),
    ]
    src_dir = str(tmp_path / "ts_drops")
    spark.createDataFrame(rows, "event_time string, text string").withColumn(
        "event_time", F.to_timestamp("event_time")
    ).write.parquet(src_dir)
    stream = spark.readStream.schema("event_time timestamp, text string").parquet(src_dir)
    out = st.streaming_window_stats(stream, window="10 seconds", watermark="30 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = {
        (str(r["window"]["start"]), r["n_docs"]) for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    assert res == {("2026-01-01 00:00:00", 2), ("2026-01-01 00:00:10", 1)}
