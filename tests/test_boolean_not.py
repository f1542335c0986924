"""Boolean NOT (Lucene MUST_NOT): `search(exclude=...)` drops documents
containing ANY excluded term, with scores untouched (corpus-wide stats; the
excluded terms contribute nothing). Resolved entirely inside the doc_range
kernels — no anti-join.

Reference parity note: the reference's query surface (SURVEY §2.10) has no
NOT; semantics follow Lucene's BooleanClause.Occur.MUST_NOT."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.scoring import parse_query

Q = "spark join stream"
EX = "hash"


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 150)
        .cache()
    )


@pytest.fixture(scope="module")
def eng(spark, corpus, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("nidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


@pytest.fixture(scope="module")
def doc_terms(corpus):
    """doc_id -> set of parsed terms (brute-force ground truth)."""
    rows = corpus.select("doc_id", "text").collect()
    return {r["doc_id"]: {t for t, _ in parse_query(r["text"])} for r in rows}


def _veto(doc_terms, exclude):
    ex = {t for t, _ in parse_query(exclude)}
    return {d for d, ts in doc_terms.items() if ts & ex}


def test_not_is_base_ranking_minus_vetoed(eng, doc_terms):
    base = eng.search(Q, k=500)
    vetoed = _veto(doc_terms, EX)
    assert any(d in vetoed for d, _ in base[:20]), "fixture too weak"
    want = [(d, s) for d, s in base if d not in vetoed][:10]
    got = eng.search(Q, k=10, exclude=EX)
    assert got == want


def test_multi_term_exclude_unions_vetoes(eng, doc_terms):
    ex = "hash window"
    vetoed = _veto(doc_terms, ex)
    base = eng.search(Q, k=500)
    want = [(d, s) for d, s in base if d not in vetoed][:10]
    assert eng.search(Q, k=10, exclude=ex) == want


def test_and_mode_with_exclude(eng, doc_terms):
    and_q = "spark the"
    base = eng.search(and_q, k=500, mode="and")
    vetoed = _veto(doc_terms, EX)
    want = [(d, s) for d, s in base if d not in vetoed][:8]
    assert eng.search(and_q, k=8, mode="and", exclude=EX) == want


def test_oov_exclude_is_noop(eng):
    base = eng.search(Q, k=10)
    assert eng.search(Q, k=10, exclude="zzzznotaterm") == base


def test_excluding_a_query_term(eng, doc_terms):
    """Exclusion wins: 'spark join NOT join' = docs with spark, without
    join, scored on spark alone; in AND mode the contradiction is empty."""
    vetoed = _veto(doc_terms, "join")
    base_spark_only = eng.search("spark", k=500)
    want = [(d, s) for d, s in base_spark_only if d not in vetoed][:10]
    assert eng.search("spark join", k=10, exclude="join") == want
    assert eng.search("spark join", k=10, mode="and", exclude="join") == []


def test_exclude_all_matches_empty(eng):
    assert eng.search(Q, k=10, exclude=Q) == []


def test_exclude_composes_with_doc_filter_and_after(eng, doc_terms):
    vetoed = _veto(doc_terms, EX)
    base = eng.search(Q, k=500)
    allow = {d for d, _ in base[::2]}
    want = [(d, s) for d, s in base if d not in vetoed and d in allow][:6]
    got = eng.search(Q, k=6, exclude=EX, doc_filter=allow)
    assert got == want

    full = eng.search(Q, k=500, exclude=EX)
    page1 = eng.search(Q, k=5, exclude=EX)
    page2 = eng.search(Q, k=5, exclude=EX, after=page1[-1])
    assert page1 + page2 == full[:10]


def test_exclude_respects_update_watermark(spark, corpus, tmp_path_factory):
    """A doc whose OLD version contained the excluded term but whose LIVE
    version does not must NOT be vetoed (the veto decode applies the epoch
    watermark), and vice versa."""
    from searchengine_spark.streaming.ingest import append_docs

    idx = str(tmp_path_factory.mktemp("nuidx") / "idx")
    append_docs(corpus, idx, id_col="doc_id", text_col="text",
                n_buckets=4, range_bits=2)
    eng = SearchEngine(spark, idx)
    base = eng.search(Q, k=500)
    surviving = {d for d, _ in eng.search(Q, k=500, exclude=EX)}
    victim = next(d for d, _ in base if d not in surviving)  # currently vetoed
    # replace the vetoed doc with text that matches Q but NOT the exclusion
    eng.update_docs(
        spark.createDataFrame([(victim, "spark join stream clean")],
                              "doc_id long, text string")
    )
    got = eng.search(Q, k=500, exclude=EX)
    assert victim in {d for d, _ in got}
