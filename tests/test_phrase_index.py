"""Positional index: codec roundtrip, index-native phrase search identical to
the relational text-scan phrase, stopword tolerance, repeated terms."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.codec import (
    decode_block_positions,
    encode_terms_blocks,
    varbyte_decode,
)
from searchengine_spark.query.engine import SearchEngine

SF_DIR = "/root/testdata/sf0.01"


def test_positions_codec_roundtrip():
    rng = np.random.default_rng(7)
    # 2 terms, ragged per-posting position lists
    docs = np.array([1, 5, 9, 2, 5], dtype=np.uint64)
    tfs = np.array([2, 1, 3, 1, 4], dtype=np.uint64)
    dls = np.array([10, 12, 30, 8, 40], dtype=np.uint64)
    starts = np.array([0, 3], dtype=np.int64)
    ends = np.array([3, 5], dtype=np.int64)
    pos_lists = [np.sort(rng.choice(1000, size=int(t), replace=False)) for t in tfs]
    flat = np.concatenate(pos_lists).astype(np.uint64)
    blk = encode_terms_blocks(
        docs, tfs, dls, starts, ends, 1.5, 0.75, 15.0, block_size=2,
        positions_flat=flat,
    )
    assert blk["pos_bytes"] is not None and len(blk["pos_bytes"]) == len(blk["block_id"])
    # blocks are emitted term-major in posting order: decode each block's
    # positional stream against the matching per-posting position lists
    row = 0
    for bi in range(len(blk["block_id"])):
        nb = int(blk["n_docs"][bi])
        dec, _ = decode_block_positions(
            varbyte_decode(blk["tf_bytes"][bi]), blk["pos_bytes"][bi]
        )
        exp = np.concatenate(pos_lists[row : row + nb]).astype(np.uint64)
        assert np.array_equal(dec, exp), bi
        row += nb
    assert row == len(docs)


@pytest.fixture(scope="module")
def pos_engine(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("pidx") / "idx")
    eng = SearchEngine(spark, idx)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    eng.build_index_from_df(
        docs, id_col="doc_id", text_col="text", range_bits=3, n_buckets=8,
        with_positions=True, fresh=True,
    )
    return eng, docs


def test_phrase_index_matches_relational(spark, pos_engine):
    from searchengine_spark.postings import dictionary, doc_stats, term_frequencies
    from searchengine_spark.scoring import phrase_topk

    eng, docs = pos_engine
    tf = term_frequencies(docs, "doc_id", "text", use_arrow_udf=False)
    stats = doc_stats(tf)
    dct = dictionary(tf)
    row = stats.agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")).collect()[0]
    n, avgdl = int(row["n"]), float(row["a"])
    for phrase in ["customer order", "spark join", "window group order"]:
        got = eng.search_phrase(phrase, k=30)
        exp = [
            (r["doc_id"], r["score"])
            for r in phrase_topk(
                spark, docs, tf, stats, dct, phrase, n, avgdl, k=30,
                id_col="doc_id", text_col="text",
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], phrase
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, abs=1e-9), phrase


def test_phrase_stopword_tolerant_and_repeated(spark, tmp_path):
    rows = [
        (1, "merge the sort quickly"),     # stopword between phrase words
        (2, "merge sort done"),            # literal adjacency
        (3, "sort merge backwards"),       # wrong order → no match
        (4, "alpha alpha beta"),           # repeated-term phrase target
        (5, "alpha beta alpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eng = SearchEngine(spark, str(tmp_path / "idx"))
    eng.build_index_from_df(df, id_col="doc_id", text_col="text",
                            range_bits=2, n_buckets=2, with_positions=True, fresh=True)
    assert {d for d, _ in eng.search_phrase("merge sort", k=10)} == {1, 2}
    assert {d for d, _ in eng.search_phrase("alpha alpha", k=10)} == {4}
    assert {d for d, _ in eng.search_phrase("alpha beta", k=10)} == {4, 5}
    assert eng.search_phrase("gamma delta", k=10) == []  # OOV term
    assert eng.search_phrase("the of", k=10) == []  # stopword-only


def test_phrase_requires_positional_index(spark, tmp_path):
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    eng = SearchEngine(spark, str(tmp_path / "idx"))
    eng.build_index_from_df(df, id_col="doc_id", text_col="text",
                            range_bits=2, n_buckets=2, fresh=True)
    with pytest.raises(ValueError, match="positions"):
        eng.search_phrase("alpha beta", k=5)


def test_span_first_limits(spark, tmp_path):
    """SpanFirst semantics on a literal corpus: end-position boundary is
    inclusive at span.end == limit, single-term spans, phrase spans, and
    limit ≥ doc length reduces to plain phrase search."""
    rows = [
        (1, "merge sort starts the file"),      # span ends at 2
        (2, "the file tail says merge sort"),   # span ends at 5 (stopword dropped)
        (3, "merge only no sort phrase"),       # phrase absent
        (4, "sort merge wrong order"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eng = SearchEngine(spark, str(tmp_path / "sfidx"))
    eng.build_index_from_df(
        df, id_col="doc_id", text_col="text", range_bits=1, n_buckets=2,
        with_positions=True, fresh=True,
    )
    ids = lambda hits: sorted(d for d, _ in hits)

    # doc 1: positions (merge=0, sort=1) → end 2; doc 2 after stopword
    # filtering: (file=0 ... merge=3, sort=4) → end 5
    assert ids(eng.search_span_first("merge sort", 2, k=10)) == [1]
    assert ids(eng.search_span_first("merge sort", 4, k=10)) == [1]
    assert ids(eng.search_span_first("merge sort", 5, k=10)) == [1, 2]
    # limit >= doc length == plain phrase
    phrase = eng.search_phrase("merge sort", k=10)
    spanall = eng.search_span_first("merge sort", 1000, k=10)
    assert phrase == spanall and ids(phrase) == [1, 2]

    # single term: first occurrence position + 1 <= limit
    assert ids(eng.search_span_first("sort", 2, k=10)) == [1, 4]
    assert ids(eng.search_span_first("sort", 5, k=10)) == [1, 2, 3, 4]

    with pytest.raises(ValueError):
        eng.search_span_first("merge sort", 0, k=10)
