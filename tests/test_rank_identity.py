"""Rank-identity: Spark relational BM25 == pure-Python oracle.

BASELINE.md contract: top-k docIDs AND scores identical (1e-9), tie-break
(score desc, doc_id asc), on both the synthetic source-code corpus and the
driver's documents table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import corpus_df, generate_rows, with_doc_id
from searchengine_spark.oracle import OracleIndex
from searchengine_spark.postings import corpus_stats, dictionary, doc_stats, term_frequencies
from searchengine_spark.scoring import bm25_score, boolean_and, topk

QUERIES = [
    "index merge posting",
    "def return import",
    "license apache version",
    "block codec varint heap",
    "parse_token stream",
]

DOC_QUERIES = ["spark join stream", "hash merge sort table", "window group order"]


def _spark_topk(spark, df, id_col, text_col, query, k):
    tf = term_frequencies(df, id_col, text_col).cache()
    stats = doc_stats(tf)
    dct = dictionary(tf)
    n, avgdl = corpus_stats(stats)
    scored = bm25_score(spark, tf, stats, dct, query, n, avgdl)
    rows = topk(scored, k).collect()
    tf.unpersist()
    return [(r["doc_id"], r["score"]) for r in rows], n, avgdl


@pytest.fixture(scope="module")
def synthetic(spark):
    df = corpus_df(spark, 300, seed=7).cache()
    df.count()
    oracle = OracleIndex.build(
        [(r["doc_id"], r["content"]) for r in df.select("doc_id", "content").collect()]
    )
    yield df, oracle
    df.unpersist()


def test_bm25_rank_identity_synthetic(spark, synthetic):
    df, oracle = synthetic
    for q in QUERIES:
        want = oracle.bm25_topk(q, 20)
        got, n, avgdl = _spark_topk(spark, df, "doc_id", "content", q, 20)
        assert n == oracle.n_docs
        assert abs(avgdl - oracle.avgdl) < 1e-9
        assert [d for d, _ in got] == [d for d, _ in want], f"docIDs differ for {q!r}"
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, f"score differs for {q!r} doc {gd}: {gs} vs {ws}"


def test_bm25_rank_identity_documents(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    oracle = OracleIndex.build(
        [(r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()]
    )
    for q in DOC_QUERIES:
        want = oracle.bm25_topk(q, 10)
        got, _, _ = _spark_topk(spark, df, "doc_id", "text", q, 10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9


def test_boolean_and_matches_oracle(spark, synthetic):
    df, oracle = synthetic
    tf = term_frequencies(df, "doc_id", "content")
    for q in ["def import return", "license apache"]:
        got = sorted(r["doc_id"] for r in boolean_and(spark, tf, q).collect())
        assert got == oracle.boolean_and(q)


def test_doc_id_no_collisions(spark):
    df = with_doc_id(
        spark.createDataFrame(generate_rows(2000, seed=3),
                              "repo string, path string, commit string, lang string, content string")
    )
    assert df.select("doc_id").distinct().count() == 2000
