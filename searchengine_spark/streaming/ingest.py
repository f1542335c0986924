"""Structured-Streaming ingestion for the index pipeline.

The reference has NO streaming (SURVEY.md §2.9 — its only incremental
behavior is the 100k-doc batch spill, ``Part A/indexer.py:15,47-51``). A
100 TB training-data pipeline, however, ingests continuously, so this module
adds the Spark-native incremental path on top of the batch builder:

  * ``stream_corpus``          — file-source ``readStream`` over a growing
                                 directory of corpus parquet drops.
  * ``incremental_index``      — ``writeStream.foreachBatch``: every
                                 micro-batch runs the SAME salted
                                 encode-to-segments job as the batch builder
                                 and appends to the index with per-batch
                                 manifest lineage (epoch id → resumable,
                                 exactly-once per checkpoint).
  * ``streaming_term_counts``  — continuously-maintained (term, df, cf)
                                 aggregate in update mode (complete agg state
                                 in the state store; dictionary-size state —
                                 small).
  * ``streaming_window_stats`` — event-time windowed ingest stats with a
                                 watermark for late data: docs/sec, avg doc
                                 length per window. The ops dashboard feed.

Scale notes: foreachBatch inherits every batch-path property (salting,
partitioned segment writes, manifests), so stream ingestion shares one code
path with backfill. maxFilesPerTrigger bounds micro-batch size; the
checkpoint dir carries the source offsets → kill/restart resumes without
reprocessing (same guarantee family as the batch builder's manifests).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..postings import term_frequencies


def stream_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source readStream over a directory receiving corpus parquet
    drops. Schema must be supplied (streaming sources cannot infer)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def incremental_index(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
    range_bits: int = 3,
    await_termination: bool = True,
):
    """Continuously append posting segments for each micro-batch of new docs.

    Each epoch writes segments under ``segments/epoch=<id>`` plus a manifest
    line, so the stream's output composes with the batch index layout and the
    query engine can include streamed segments by reading the manifest.
    Trigger(availableNow=True) drains what exists then stops — the test and
    backfill mode; pass await_termination=False for a live continuous query.
    """
    from ..index.build import BLOCK_SCHEMA, _encode_group_fn, _manifest_append

    os.makedirs(index_dir, exist_ok=True)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        tf = term_frequencies(batch_df, id_col, text_col, use_arrow_udf=False)
        stats = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
        agg = stats.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
        ).collect()[0]
        if not agg["n"]:
            return
        staged = (
            tf.join(stats, "doc_id")
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
            .withColumn(
                "doc_range",
                F.shiftrightunsigned(F.col("doc_id"), 64 - range_bits).cast("int"),
            )
        )
        encode = _encode_group_fn(1.5, 0.75, float(agg["avgdl"]), 128)
        enc = staged.groupBy("bucket", "doc_range").applyInPandas(encode, BLOCK_SCHEMA)
        out = os.path.join(index_dir, "segments", f"epoch={epoch_id}")
        enc.write.mode("overwrite").partitionBy("bucket").parquet(out)
        n_blocks = spark.read.parquet(out).count()
        _manifest_append(
            index_dir,
            {
                "kind": "stream_epoch",
                "bucket": None,
                "epoch": int(epoch_id),
                "n_docs": int(agg["n"]),
                "n_blocks": int(n_blocks),
                "ts": time.time(),
            },
        )

    q = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def streaming_term_counts(stream_df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Continuously-maintained (term, cf) aggregate — write with
    outputMode('update')/('complete') for a live collection-frequency
    dictionary. ONE streaming aggregation by design: chaining the batch
    path's tf→dictionary aggs is two stateful operators, which Structured
    Streaming rejects (global-watermark correctness check); exact df is
    maintained by the ``incremental_index`` foreachBatch path instead, where
    each micro-batch runs full batch semantics."""
    from ..tokenizer import tokenize_raw_expr

    toks = stream_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))


def streaming_window_stats(
    stream_df: DataFrame,
    ts_col: str = "event_time",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    text_col: str = "text",
) -> DataFrame:
    """Event-time windowed ingest stats with late-data watermark:
    (window, n_docs, avg_len). Aggregates append-finalize once the watermark
    passes the window end."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.length(text_col)).alias("avg_len"),
        )
    )


def read_stream_manifest(index_dir: str) -> list[dict]:
    p = os.path.join(index_dir, "manifest.jsonl")
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(x) for x in f if x.strip() and "stream_epoch" in x]
