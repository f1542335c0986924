"""Late-interaction MaxSim: the relational pipeline must equal a
pure-Python oracle over the same md5 stand-in embeddings, and the plan
must stay join-free (query vectors ride as literals)."""

from __future__ import annotations

import hashlib

import pytest

from searchengine_spark.ops.similarity import maxsim_topk


def _emb(term, dim=8):
    d = hashlib.md5(term.encode()).digest()
    return [d[i % 16] / 128.0 - 1.0 for i in range(dim)]


def _brute(doc_terms, query_terms, dim=8):
    docs = {}
    for doc, term in doc_terms:
        docs.setdefault(doc, set()).add(term)
    out = {}
    for doc, terms in docs.items():
        s = 0.0
        for q in sorted(set(query_terms)):
            qe = _emb(q, dim)
            s += max(
                sum(a * b for a, b in zip(qe, _emb(t, dim))) for t in terms
            )
        out[doc] = round(s, 5)
    return out


DT = [
    (1, "spark"), (1, "join"), (1, "filter"),
    (2, "stream"), (2, "window"), (2, "spark"),
    (3, "parquet"), (3, "schema"),
    (4, "join"), (4, "stream"), (4, "shuffle"), (4, "spark"),
    (5, "unrelated"),
]
Q = ["spark", "join", "stream"]


def test_maxsim_matches_brute(spark):
    df = spark.createDataFrame(DT, "doc_id long, term string")
    got = {(r["doc_id"], r["score"]) for r in maxsim_topk(df, Q, k=10).collect()}
    want = _brute(DT, Q)
    assert {d for d, _ in got} == set(want)
    for d, s in got:
        assert s == pytest.approx(want[d], abs=2e-5)


def test_maxsim_ranking_prefers_full_coverage(spark):
    # doc 4 contains every query term → per-token best match is the exact
    # term (self dot = max) → highest score
    df = spark.createDataFrame(DT, "doc_id long, term string")
    top = maxsim_topk(df, Q, k=1).collect()[0]
    assert top["doc_id"] == 4


def test_maxsim_duplicate_terms_no_effect(spark):
    df1 = spark.createDataFrame(DT, "doc_id long, term string")
    df2 = spark.createDataFrame(DT + DT, "doc_id long, term string")
    a = [(r["doc_id"], r["score"]) for r in maxsim_topk(df1, Q, k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in maxsim_topk(df2, Q, k=10).collect()]
    assert a == b


def test_maxsim_plan_is_join_free(spark):
    import contextlib
    import io

    df = spark.createDataFrame(DT, "doc_id long, term string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        maxsim_topk(df, Q, k=5).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_maxsim_custom_term_col(spark):
    """term_col other than 'term' must work: the dot expressions are
    applied AFTER the column is aliased to 'term'. Regression: they were
    built over the original name and raised an AnalysisException."""
    rows = [(1, "spark"), (1, "join"), (2, "stream"), (2, "merge")]
    a = spark.createDataFrame(rows, "doc_id long, term string")
    b = spark.createDataFrame(rows, "doc_id long, piece string")
    got_a = [(r["doc_id"], r["score"])
             for r in maxsim_topk(a, ["spark", "stream"], k=5).collect()]
    got_b = [(r["doc_id"], r["score"])
             for r in maxsim_topk(b, ["spark", "stream"], k=5,
                                  term_col="piece").collect()]
    assert got_a == got_b and got_a
