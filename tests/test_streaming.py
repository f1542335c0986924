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


def test_streamed_index_is_queryable_and_matches_batch(spark, tmp_path):
    """The round-1 gap: ingest two drops → SearchEngine answers over BOTH
    epochs, rank-identical (scores included) to a batch build of the union,
    picking the second epoch up through the meta fingerprint without an
    explicit refresh; WAND (avgdl-robust bounds) == vectorized."""
    from searchengine_spark.query.engine import SearchEngine

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 80
    )
    d = str(tmp_path / "qdrops")
    idx = str(tmp_path / "qidx")
    ckpt = str(tmp_path / "qckpt")
    q = "spark join stream"

    src.filter(F.col("doc_id") < 40).write.parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    eng = SearchEngine(spark, idx)
    hits1 = eng.search(q, k=20)
    assert hits1 and all(i < 40 for i, _ in hits1)

    src.filter(F.col("doc_id") >= 40).write.mode("append").parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    hits2 = eng.search(q, k=20)  # no explicit refresh — meta change detected

    bidx = str(tmp_path / "bidx")
    beng = SearchEngine(spark, bidx)
    beng.build_index_from_df(src, id_col="doc_id", text_col="text",
                             range_bits=2, n_buckets=4)
    assert hits2 == beng.search(q, k=20)
    ids = {i for i, _ in hits2}
    assert any(i < 40 for i in ids) and any(i >= 40 for i in ids)
    assert eng.search(q, k=20, use_wand=False) == hits2


def test_streamed_and_mode_across_interleaved_epochs(spark, tmp_path):
    """Regression (round-2 review): epochs whose doc-id ranges interleave
    within one doc_range break the AND cursor's sorted-blocks invariant —
    doc 5 (epoch 2) lies between epoch 1's docs {0, 10} and was silently
    dropped by mode='and', use_wand=True."""
    from searchengine_spark.query.engine import SearchEngine

    d = str(tmp_path / "adrops")
    idx = str(tmp_path / "aidx")
    ckpt = str(tmp_path / "ackpt")
    schema = "doc_id long, text string"
    spark.createDataFrame([(0, "apple banana"), (10, "apple banana")], schema
                          ).write.parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                         n_buckets=2, range_bits=1)
    spark.createDataFrame([(5, "apple banana")], schema).write.mode("append").parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                         n_buckets=2, range_bits=1)
    eng = SearchEngine(spark, idx)
    wand = eng.search("apple banana", k=10, mode="and", use_wand=True)
    vect = eng.search("apple banana", k=10, mode="and", use_wand=False)
    assert {i for i, _ in wand} == {0, 5, 10}
    assert wand == vect
    # OR mode too, for completeness
    assert eng.search("apple banana", k=10) == eng.search(
        "apple banana", k=10, use_wand=False
    )


def test_compaction_folds_epochs_preserving_results(spark, tmp_path):
    """compact_streamed_index: epochs fold into one, results identical before
    and after, engine flips back to tight bounds, and the stream can keep
    appending afterwards."""
    import os

    from searchengine_spark.index.build import IndexMeta
    from searchengine_spark.query.engine import SearchEngine

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    d = str(tmp_path / "cdrops")
    idx = str(tmp_path / "cidx")
    ckpt = str(tmp_path / "cckpt")
    q = "spark join stream"

    src.filter(F.col("doc_id") < 20).write.parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    src.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)).write.mode(
        "append"
    ).parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    eng = SearchEngine(spark, idx)
    before = eng.search(q, k=20)
    assert before

    st.ingest.compact_streamed_index(spark, idx)
    meta = IndexMeta.load(idx)
    assert meta.stream_epochs == 0
    # pointer swap, not rename: compacted segments live in a fresh versioned
    # dir; the superseded dir is RETAINED one generation for live readers
    assert meta.segments_dir == "segments_c1"
    parts = sorted(
        p
        for p in os.listdir(os.path.join(idx, meta.segments_dir))
        if p.startswith("epoch=")
    )
    assert parts == ["epoch=0"]
    assert os.path.isdir(os.path.join(idx, "segments"))  # grace retention
    after = eng.search(q, k=20)  # auto-refresh via meta fingerprint
    assert after == before
    assert eng.search(q, k=20, use_wand=False) == before

    # the stream keeps appending on top of the compacted index (in the NEW dir)
    src.filter(F.col("doc_id") >= 40).write.mode("append").parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    assert IndexMeta.load(idx).stream_epochs == 1
    new_parts = os.listdir(os.path.join(idx, "segments_c1"))
    assert len([p for p in new_parts if p.startswith("epoch=")]) == 2
    final = eng.search(q, k=50)
    assert {i for i, _ in final} >= {i for i, _ in before}
    assert any(i >= 40 for i, _ in final)
    assert eng.search(q, k=50, use_wand=False) == final

    # a SECOND compaction expires the two-generation-old dir
    st.ingest.compact_streamed_index(spark, idx)
    meta2 = IndexMeta.load(idx)
    assert meta2.segments_dir == "segments_c2"
    assert os.path.isdir(os.path.join(idx, "segments_c1"))  # previous kept
    assert not os.path.exists(os.path.join(idx, "segments"))  # expired
    assert eng.search(q, k=50) == final


def test_streamed_positions_phrase_matches_batch(spark, tmp_path):
    """VERDICT r2 ask #4: with_positions=True carries the positional stream
    through streamed epochs — search_phrase over a two-epoch streamed index
    must equal a positional BATCH build of the union; and compaction must
    PRESERVE the positional stream (phrase results identical after folding)."""
    from searchengine_spark.index.build import IndexMeta
    from searchengine_spark.query.engine import SearchEngine

    # split at 60 so the phrase occurs on BOTH sides (docs 2/34 in epoch 1,
    # 95/96/... in epoch 2) — the cross-epoch assert below is non-vacuous
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 130
    )
    d = str(tmp_path / "pdrops")
    idx = str(tmp_path / "pidx")
    ckpt = str(tmp_path / "pckpt")
    phrase = "spark join"

    src.filter(F.col("doc_id") < 60).write.parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2, with_positions=True)
    src.filter(F.col("doc_id") >= 60).write.mode("append").parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2, with_positions=True)
    assert IndexMeta.load(idx).has_positions

    eng = SearchEngine(spark, idx)
    streamed = eng.search_phrase(phrase, k=20)

    bidx = str(tmp_path / "pbidx")
    beng = SearchEngine(spark, bidx)
    beng.build_index_from_df(src, id_col="doc_id", text_col="text",
                             range_bits=2, n_buckets=4, with_positions=True)
    batch = beng.search_phrase(phrase, k=20)
    assert streamed == batch
    assert streamed  # non-vacuous: the phrase occurs in the corpus
    ids = {i for i, _ in streamed}
    assert any(i < 60 for i in ids) and any(i >= 60 for i in ids)

    # compaction keeps the positional stream
    st.ingest.compact_streamed_index(spark, idx)
    meta = IndexMeta.load(idx)
    assert meta.stream_epochs == 0 and meta.has_positions
    assert eng.search_phrase(phrase, k=20) == batch


def test_streamed_positions_flag_flip_refused(spark, tmp_path):
    """Restarting an ingest with the opposite with_positions flag would mix
    positional and position-free epochs (crash on decode or silent stream
    loss at compaction) — the second run must refuse (round-3 review)."""
    import pytest as _pytest

    d = str(tmp_path / "fdrops")
    idx = str(tmp_path / "fidx")
    ckpt = str(tmp_path / "fckpt")  # SAME checkpoint: the restart scenario
    schema = "doc_id long, text string"
    spark.createDataFrame([(0, "apple banana")], schema).write.parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                         n_buckets=2, range_bits=1, with_positions=True)
    spark.createDataFrame([(1, "apple pear")], schema).write.mode("append").parquet(d)
    with _pytest.raises(Exception, match="has_positions"):
        st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                             n_buckets=2, range_bits=1, with_positions=False)


def test_fresh_checkpoint_on_existing_index_refused(spark, tmp_path):
    """A NEW checkpoint restarts epoch ids at 0; the old replay guard
    treated the collision as a replay and silently dropped the batch's docs
    — it must refuse instead (round-3 review follow-up)."""
    import pytest as _pytest

    d = str(tmp_path / "sdrops")
    idx = str(tmp_path / "sidx")
    schema = "doc_id long, text string"
    spark.createDataFrame([(0, "apple banana")], schema).write.parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, schema), idx,
                         str(tmp_path / "sck1"), n_buckets=2, range_bits=1)
    spark.createDataFrame([(1, "apple pear")], schema).write.mode("append").parquet(d)
    with _pytest.raises(Exception, match="different checkpoint"):
        st.incremental_index(st.stream_corpus(spark, d, schema), idx,
                             str(tmp_path / "sck2"), n_buckets=2, range_bits=1)


def test_streamed_manifest_idempotent_and_meta_consistent(spark, tmp_path, drop_dir):
    """Replay protection: re-running a drained stream adds no manifest lines;
    meta carries exact running totals and the dictionary pointer resolves."""
    import os

    from searchengine_spark.index.build import IndexMeta

    d, schema = drop_dir
    idx = str(tmp_path / "midx")
    ckpt = str(tmp_path / "mckpt")
    st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    lines1 = st.ingest.read_stream_manifest(idx)
    st.incremental_index(st.stream_corpus(spark, d, schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    assert st.ingest.read_stream_manifest(idx) == lines1  # no duplicate rows
    meta = IndexMeta.load(idx)
    assert meta.stream_epochs == len(lines1)
    assert meta.n_docs == sum(e["n_docs"] for e in lines1) == 60
    assert abs(meta.avgdl - meta.total_len / meta.n_docs) < 1e-12
    dct = spark.read.parquet(os.path.join(idx, meta.dictionary_dir))
    assert {"term", "bucket", "df", "cf", "max_tf", "min_dl", "idf", "max_u"} <= set(
        dct.columns
    )


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


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates across micro-batches are
    dropped via the state store; restart on the same checkpoint does not
    re-emit."""
    from pyspark.sql import functions as F

    from searchengine_spark.streaming.dedup import streaming_exact_dedup

    d = str(tmp_path / "dd_drops")
    ckpt = str(tmp_path / "dd_ckpt")
    rows1 = [(1, "alpha body"), (2, "beta body"), (3, "alpha body")]
    rows2 = [(4, "alpha body"), (5, "gamma body"), (6, "beta body")]

    sink = str(tmp_path / "dd_sink")

    def drain():
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["doc_id"], r["text_md5"])
            for r in spark.read.parquet(sink).collect()
        }

    # batch 1: in-batch duplicate (1,3) → keeper 1 (smallest doc_id)
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(d)
    got1 = drain()
    assert {i for i, _ in got1} == {1, 2}

    # batch 2 on the SAME checkpoint: state survives the restart — alpha and
    # beta are already seen, only gamma's keeper is newly emitted
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode("append").parquet(d)
    got2 = drain()
    assert {i for i, _ in got2} == {1, 2, 5}


def test_tws_dedup_processor_kernel(spark):
    """transformWithState ListState processor: same first-seen semantics as
    the applyInPandasWithState path, but state writes are APPENDS of only
    the new digests (the 10^12-scale property). Driven directly against a
    fake ListState — the streaming wiring needs protobuf (absent here)."""
    import pandas as pd

    from searchengine_spark.streaming.dedup import DedupListStateProcessor

    class FakeListState:
        def __init__(self):
            self.rows = []
            self.append_calls = []

        def get(self):
            return iter([{"digest": d} for (d,) in self.rows])

        def appendList(self, vals):
            self.append_calls.append(list(vals))
            self.rows.extend(vals)

    proc = DedupListStateProcessor()
    proc.seen = FakeListState()

    def md5(text):
        import hashlib

        return hashlib.md5(text.encode()).hexdigest()

    b1 = pd.DataFrame({"doc_id": [3, 1, 2], "text_md5": [md5("alpha"), md5("alpha"), md5("beta")]})
    out1 = pd.concat(list(proc.handleInputRows(("aa",), iter([b1]))))
    # in-batch duplicate: keeper is the smallest doc_id
    assert sorted(out1["doc_id"]) == [1, 2]
    assert len(proc.seen.append_calls) == 1 and len(proc.seen.append_calls[0]) == 2

    b2 = pd.DataFrame({"doc_id": [4, 5], "text_md5": [md5("alpha"), md5("gamma")]})
    out2 = pd.concat(list(proc.handleInputRows(("aa",), iter([b2]))))
    # cross-batch duplicate dropped via state; ONLY gamma's digest appended
    assert sorted(out2["doc_id"]) == [5]
    assert len(proc.seen.append_calls[1]) == 1

    # empty batch: no emit rows, no state append
    out3 = pd.concat(list(proc.handleInputRows(("aa",), iter([b2.iloc[:0]]))))
    assert len(out3) == 0 and len(proc.seen.append_calls) == 2


def test_tws_wiring_gated_or_runs(spark, tmp_path):
    """In this sandbox (no protobuf) the TWS entry point refuses loudly; on
    an environment that has it, it must produce the same results as the
    applyInPandasWithState path."""
    from searchengine_spark.streaming.dedup import (
        _tws_available,
        streaming_exact_dedup_tws,
    )

    d = str(tmp_path / "drops")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    ).write.parquet(d)
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    if not _tws_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            streaming_exact_dedup_tws(stream)
        return
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sink = str(tmp_path / "sink")
        q = (
            streaming_exact_dedup_tws(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert {r["doc_id"] for r in spark.read.parquet(sink).collect()} == {1, 2}
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_minhash_dedup(spark, tmp_path):
    """Streaming LSH near-dup across micro-batches: when arrival order
    equals doc_id order, the flagged set must equal {doc_b of every batch
    minhash_band_pairs pair} over the union corpus — in-batch collisions,
    cross-batch collisions, and state survival across a restart included."""
    from searchengine_spark.ops.dedup import minhash_band_pairs
    from searchengine_spark.streaming.dedup import (
        near_dup_verdicts,
        streaming_minhash_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    alt = "completely different text about spark shuffle partitions and joins"
    rows1 = [
        (1, base),
        (2, alt),
        (3, base.replace("river", "creek")),   # near-dup of 1, same batch
    ]
    rows2 = [
        (4, base.replace("dog", "cat")),       # near-dup of 1/3, prior batch
        (5, "unrelated fresh content with many novel words in this sentence"),
        (6, alt + " extra"),                   # near-dup of 2
    ]

    d = str(tmp_path / "nd_src")
    ckpt = str(tmp_path / "nd_ckpt")
    sink = str(tmp_path / "nd_sink")

    def drain():
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        q = (
            streaming_minhash_dedup(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        per_band = spark.read.parquet(sink)
        return {
            r["doc_id"]: r["is_dup"]
            for r in near_dup_verdicts(per_band).collect()
        }

    def batch_flags(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_b"] for r in minhash_band_pairs(df).collect()}

    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(d)
    got1 = drain()
    want1 = batch_flags(rows1)
    assert set(got1) == {1, 2, 3}
    assert {i for i, dup in got1.items() if dup} == want1

    # second drain on the SAME checkpoint: batch-1 buckets persist
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(d)
    got2 = drain()
    want2 = batch_flags(rows1 + rows2)
    assert set(got2) == {1, 2, 3, 4, 5, 6}
    assert {i for i, dup in got2.items() if dup} == want2
    # sanity on the fixture itself: something IS flagged and something isn't
    assert want2 and want2 < {1, 2, 3, 4, 5, 6}


def test_streaming_simhash_dedup(spark, tmp_path):
    """EXACT streaming SimHash near-dup: with arrival order == doc_id
    order the flagged set must equal {doc_b of every simhash_neardup pair}
    over the union corpus — in-batch hits, cross-batch hits, and state
    survival across a restart; and unlike LSH-candidate streaming, a
    bucket collision at distance > d must NOT flag."""
    from searchengine_spark.ops.dedup import simhash_neardup
    from searchengine_spark.streaming.dedup import (
        near_dup_verdicts,
        streaming_simhash_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    alt = "completely different text about spark shuffle partitions and joins"
    rows1 = [
        (1, base),
        (2, alt),
        (3, base.replace("river", "creek")),   # near-dup of 1, same batch
    ]
    rows2 = [
        (4, base.replace("dog", "cat")),       # near-dup of 1/3, prior batch
        (5, "unrelated fresh content with many novel words in this sentence"),
        (6, alt + " extra"),                   # near-dup of 2
    ]
    D = 14

    src = str(tmp_path / "sh_src")
    ckpt = str(tmp_path / "sh_ckpt")
    sink = str(tmp_path / "sh_sink")

    def drain():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = (
            streaming_simhash_dedup(stream, d=D)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        per_band = spark.read.parquet(sink)
        return {
            r["doc_id"]: r["is_dup"]
            for r in near_dup_verdicts(per_band).collect()
        }

    def batch_flags(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_b"] for r in simhash_neardup(df, d=D).collect()}

    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(src)
    got1 = drain()
    assert set(got1) == {1, 2, 3}
    assert {i for i, dup in got1.items() if dup} == batch_flags(rows1)

    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    got2 = drain()
    new = {i: dup for i, dup in got2.items() if i >= 4}
    assert set(new) == {4, 5, 6}
    want_union = batch_flags(rows1 + rows2)
    assert {i for i, dup in new.items() if dup} == want_union - {1, 2, 3}


class _StubState:
    """Minimal GroupState stand-in for driving the kernels directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_dedup_kernel_is_chunk_invariant():
    """The min-doc_id keeper must not depend on Arrow chunk boundaries:
    doc 5 in chunk 1 and doc 2 (same hash) in chunk 2 → keeper is 2."""
    import pandas as pd

    from searchengine_spark.streaming.dedup import _dedup_group

    h = "ab" * 16
    st = _StubState()
    chunks = [
        pd.DataFrame({"doc_id": [5], "text_md5": [h]}),
        pd.DataFrame({"doc_id": [2], "text_md5": [h]}),
    ]
    (out,) = list(_dedup_group(("ab",), iter(chunks), st))
    assert list(out["doc_id"]) == [2]


def test_neardup_kernel_sees_cross_chunk_collisions():
    """A band-hash collision whose two holders land in different chunks of
    one micro-batch must still mark the later doc as a hit."""
    import pandas as pd

    from searchengine_spark.streaming.dedup import _neardup_group

    h = "cd" * 16
    st = _StubState()
    chunks = [
        pd.DataFrame({"doc_id": [1], "band": [0], "band_hash": [h]}),
        pd.DataFrame({"doc_id": [9], "band": [0], "band_hash": [h]}),
    ]
    (out,) = list(_neardup_group((0, "c"), iter(chunks), st))
    verdict = dict(zip(out["doc_id"], out["hit"]))
    assert verdict == {1: False, 9: True}


def test_simhash_kernel_cap_and_slab():
    """State freezes at max_bucket; verdicts stay exact against retained
    signatures (and the slabbed kernel matches the dense one)."""
    import numpy as np
    import pandas as pd

    from searchengine_spark.streaming.dedup import _make_simhash_group

    fn = _make_simhash_group(d=0, max_bucket=2)
    st = _StubState()
    sigs = np.array([10, 20, 30], dtype=np.uint64).view(np.int64)
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "band": [0, 0, 0],
                        "simhash": sigs})
    (out,) = list(fn((0, 0), iter([pdf]), st))
    assert not out["hit"].any()  # three distinct signatures
    assert len(np.frombuffer(bytes(st.get[0]), dtype=np.uint64)) == 2  # capped
    # an exact repeat of a RETAINED signature still hits
    pdf2 = pd.DataFrame({"doc_id": [4], "band": [0],
                         "simhash": np.array([10], dtype=np.uint64).view(np.int64)})
    (out2,) = list(fn((0, 0), iter([pdf2]), st))
    assert bool(out2["hit"].iloc[0])
