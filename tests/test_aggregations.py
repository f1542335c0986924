"""Index-native aggregation surfaces: histogram facets, per-doc term
vectors, and significant-terms (ES ``histogram`` / Lucene ``TermVectors`` /
ES ``significant_terms`` JLH analogues).

Reference parity note: the reference has none of these; they are
engine-hardening surface over the same match-set / decode kernels, kept
honest by tf-truth identities here and DuckDB twins in the driver entries
(facet_histogram, term_vectors, significant_terms)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.postings import term_frequencies
from searchengine_spark.query.engine import SearchEngine

QUERY = "spark stream"


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 150)
        .cache()
    )


@pytest.fixture(scope="module")
def eng(spark, corpus, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("agg") / "idx"))
    e.build_index_from_df(
        corpus, id_col="doc_id", text_col="text", n_buckets=4, range_bits=2
    )
    return e


def _matched(spark, corpus, terms):
    tf = term_frequencies(corpus)
    return {
        r[0]
        for r in tf.filter(F.col("term").isin(terms))
        .select("doc_id")
        .distinct()
        .collect()
    }


def test_facet_histogram_equals_truth(spark, corpus, eng):
    got = {
        (r["bucket"], r["n"])
        for r in eng.facet_histogram(QUERY, corpus, "n_chars", 100.0).collect()
    }
    matched = _matched(spark, corpus, QUERY.split())
    truth: dict[float, int] = {}
    for r in corpus.select("doc_id", "n_chars").collect():
        if r["doc_id"] in matched:
            b = math.floor(r["n_chars"] / 100.0) * 100.0
            truth[b] = truth.get(b, 0) + 1
    assert got == set(truth.items()) and got
    # only non-empty buckets (min_doc_count=1)
    assert all(n > 0 for _, n in got)


def test_term_vectors_equals_tf_truth(spark, corpus, eng):
    ids = [r[0] for r in corpus.select("doc_id").orderBy("doc_id").limit(3).collect()]
    got = eng.term_vectors(ids).toPandas()
    assert set(got["doc_id"]) == set(ids)
    tf = term_frequencies(corpus).filter(F.col("doc_id").isin(ids)).toPandas()
    want = {(r.doc_id, r.term): r.tf for r in tf.itertuples()}
    assert {(r.doc_id, r.term): r.tf for r in got.itertuples()} == want
    # dl on every row is the doc's total token count
    dls = tf.groupby("doc_id")["tf"].sum().to_dict()
    assert all(dls[d] == dl for d, dl in zip(got["doc_id"], got["dl"]))


def test_term_vectors_empty_and_missing(eng):
    assert eng.term_vectors([]).count() == 0
    assert eng.term_vectors([999999999]).count() == 0


def test_term_vectors_respects_deletes(spark, corpus, tmp_path):
    e = SearchEngine(spark, str(tmp_path / "idx"))
    e.build_index_from_df(
        corpus, id_col="doc_id", text_col="text", n_buckets=4, range_bits=2
    )
    ids = [r[0] for r in corpus.select("doc_id").orderBy("doc_id").limit(2).collect()]
    e.delete_docs([ids[0]])
    got = set(e.term_vectors(ids).select("doc_id").distinct().toPandas()["doc_id"])
    assert got == {ids[1]}


def _sig_truth(spark, corpus, terms, top_n=10):
    tf = term_frequencies(corpus).toPandas()
    matched = set(tf[tf["term"].isin(terms)]["doc_id"])
    n = tf["doc_id"].nunique()
    fg_total = len(matched)
    fg = tf[tf["doc_id"].isin(matched)].groupby("term")["doc_id"].nunique()
    bg = tf.groupby("term")["doc_id"].nunique()
    rows = []
    for t, f in fg.items():
        fgp, bgp = f / fg_total, bg[t] / n
        rows.append((round((fgp - bgp) * (fgp / bgp), 6), t, int(f), int(bg[t])))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(t, f, b, s) for s, t, f, b in rows[:top_n]]


def test_significant_terms_equals_truth(spark, corpus, eng):
    got = [
        (r["term"], r["fg_df"], r["bg_df"], r["score"])
        for r in eng.significant_terms(QUERY, top_n=10).collect()
    ]
    assert got == _sig_truth(spark, corpus, QUERY.split(), top_n=10)
    # the query's own terms are in the candidate set and score positive
    assert any(t == "spark" for t, *_ in got)


def test_significant_terms_empty_match(spark, eng):
    assert eng.significant_terms("zzzznotaterm").count() == 0


def test_significant_terms_min_fg(spark, corpus, eng):
    got = eng.significant_terms(QUERY, top_n=50, min_fg=5).toPandas()
    assert (got["fg_df"] >= 5).all() and len(got)
