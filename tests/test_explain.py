"""Lucene-style explain(): per-(doc, term) BM25 breakdown whose
contributions sum back to exactly the search scores."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("eidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def test_contributions_sum_to_search_scores(eng):
    hits = eng.search("spark stream join", k=6)
    assert hits
    ids = [d for d, _ in hits]
    got = {
        r["doc_id"]: r["s"]
        for r in eng.explain("spark stream join", ids)
        .groupBy("doc_id")
        .agg(F.sum("contribution").alias("s"))
        .collect()
    }
    for d, score in hits:
        assert got[d] == pytest.approx(score, abs=1e-9)


def test_rows_are_only_requested_docs_and_matching_terms(eng):
    rows = eng.explain("spark stream", [3, 9]).collect()
    assert rows
    assert {r["doc_id"] for r in rows} <= {3, 9}
    assert {r["term"] for r in rows} <= {"spark", "stream"}
    for r in rows:
        assert r["tf"] >= 1 and r["dl"] >= r["tf"] and r["df"] >= 1


def test_weighted_rewriter_scales_contributions(eng):
    top = eng.search("spark", k=1)[0][0]
    base = eng.explain("spark", [top]).collect()
    boosted = eng.explain(
        "spark", [top], rewriter=lambda _q: [("spark", 2.0)]
    ).collect()
    assert len(base) == len(boosted) == 1
    assert boosted[0]["contribution"] == pytest.approx(
        2.0 * base[0]["contribution"], rel=1e-12
    )


def test_oov_query_yields_empty(eng):
    assert eng.explain("qqqq", [3]).count() == 0
