"""minimum_should_match (ES bool should + msm): an OR result must match
at least m DISTINCT query terms; surviving docs keep their plain OR score.
Checked against a brute-force Python filter of the unconstrained ranking,
plus the boundary semantics (m=0/1 no-op, m=|q| ≡ AND, m>|matchable| → [],
mode='and' refused) and sharded composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.tokenizer import tokenize_py

DOCS = "/root/testdata/sf0.001/documents.parquet"
Q = "dup spark merge stream"


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet(DOCS)
        .filter(F.col("doc_id") < 250)
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def eng(spark, corpus, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("msmidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


@pytest.fixture(scope="module")
def term_sets(corpus):
    return {
        r["doc_id"]: set(tokenize_py(r["text"])) for r in corpus.collect()
    }


def _expect(base, term_sets, qterms, m, k):
    keep = [
        (d, s) for d, s in base
        if len(qterms & term_sets[d]) >= m
    ]
    return keep[:k]


@pytest.mark.parametrize("m", [2, 3])
def test_msm_matches_bruteforce(eng, term_sets, m):
    qterms = set(tokenize_py(Q))
    base = eng.search(Q, k=10_000, use_wand=False)
    want = _expect(base, term_sets, qterms, m, 25)
    got = eng.search(Q, k=25, min_should_match=m)
    assert got == want
    # m actually bites: the constrained set is a strict subset
    assert len([1 for d, _ in base if len(qterms & term_sets[d]) >= m]) < len(base)
    assert want  # and is non-empty, so the check is meaningful


def test_msm_boundaries(eng):
    base = eng.search(Q, k=25)
    assert eng.search(Q, k=25, min_should_match=0) == base
    assert eng.search(Q, k=25, min_should_match=1) == base
    # m = |q| ≡ conjunctive match set (scores are OR scores in both paths)
    n = len(set(tokenize_py(Q)))
    assert eng.search(Q, k=50, min_should_match=n) == eng.search(
        Q, k=50, mode="and", use_wand=False
    )
    # requirement above the matchable clause count → []
    assert eng.search(Q, k=10, min_should_match=n + 1) == []
    assert eng.search("spark zzznope", k=10, min_should_match=2) == []
    with pytest.raises(ValueError):
        eng.search(Q, k=5, mode="and", min_should_match=2)


# ----------------------------------------------------- terms_set (per-doc m)
def _scoring_ctx(spark, corpus):
    from searchengine_spark.postings import dictionary, doc_stats, term_frequencies

    tf = term_frequencies(corpus, "doc_id", "text")
    stats = doc_stats(tf)
    dct = dictionary(tf)
    row = stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")
    ).collect()[0]
    return tf, stats, dct, int(row["n"]), float(row["a"])


def test_terms_set_matches_bruteforce(spark, corpus, eng, term_sets):
    """Per-doc dynamic threshold: required(doc) = doc_id % 3 + 1. Survivors
    are exactly {doc: |matched| >= required(doc)} with plain OR scores —
    checked against the unconstrained ranking filtered in Python."""
    from searchengine_spark.scoring import terms_set_score

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, corpus)
    qterms = set(tokenize_py(Q))
    required = corpus.select(
        "doc_id", (F.pmod(F.col("doc_id"), F.lit(3)) + 1).alias("required")
    )
    got = {
        r["doc_id"]: r["score"]
        for r in terms_set_score(
            spark, tf, stats, dct, Q, required, n, avgdl
        ).collect()
    }
    base = dict(eng.search(Q, k=10_000, use_wand=False))
    want = {
        d: s
        for d, s in base.items()
        if len(qterms & term_sets[d]) >= (d % 3 + 1)
    }
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-9
    # thresholds actually vary the outcome: some docs survive at m=1 that
    # fail at their own higher requirement
    assert len(got) < len(base)
    assert got


def test_terms_set_missing_field_never_matches(spark, corpus, eng, term_sets):
    """ES semantics: a doc without the minimum_should_match_field cannot
    match (inner join); required > |query terms| can never match."""
    from searchengine_spark.scoring import terms_set_score

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, corpus)
    # only even doc_ids carry the field
    required = corpus.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.lit(1).alias("required")
    )
    got = {r["doc_id"] for r in terms_set_score(
        spark, tf, stats, dct, Q, required, n, avgdl
    ).collect()}
    assert got and all(d % 2 == 0 for d in got)
    # required above the query's term count → empty
    nq = len(set(tokenize_py(Q)))
    req_hi = corpus.select("doc_id", F.lit(nq + 1).alias("required"))
    assert terms_set_score(
        spark, tf, stats, dct, Q, req_hi, n, avgdl
    ).count() == 0
    # required <= 0 clamps to 1 (any single match suffices)
    req_zero = corpus.select("doc_id", F.lit(0).alias("required"))
    base = dict(eng.search(Q, k=10_000, use_wand=False))
    got0 = {r["doc_id"] for r in terms_set_score(
        spark, tf, stats, dct, Q, req_zero, n, avgdl
    ).collect()}
    assert got0 == set(base)


def test_msm_sharded_identical(spark, corpus, eng, tmp_path_factory):
    from searchengine_spark.query.sharded import ShardedEngine

    se = ShardedEngine.build(
        spark, corpus, str(tmp_path_factory.mktemp("msmsh")), 3,
        n_buckets=4, range_bits=2,
    )
    for m in (2, 3):
        got = se.search(Q, k=20, min_should_match=m)
        want = eng.search(Q, k=20, min_should_match=m)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12, abs=1e-12)
