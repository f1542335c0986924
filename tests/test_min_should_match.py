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
