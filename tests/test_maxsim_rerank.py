"""Retrieve-then-rerank with MaxSim: the engine path (WAND candidates →
stored term vectors → MaxSim) must score candidates identically to the
standalone maxsim_topk over the same docs' raw-text term frequencies."""

from __future__ import annotations

import pytest

from searchengine_spark.corpus import corpus_df
from searchengine_spark.ops.similarity import maxsim_topk
from searchengine_spark.postings import term_frequencies
from searchengine_spark.query.engine import SearchEngine

Q = "spark join stream"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("msr"))
    df = corpus_df(spark, 250, seed=11).cache()
    eng = SearchEngine(spark, idx_dir)
    eng.build_index_from_df(df, range_bits=2, n_buckets=4, fresh=True)
    yield eng, df
    df.unpersist()


def test_rerank_matches_standalone(spark, built):
    eng, df = built
    got = eng.search_rerank_maxsim(Q, k=10, n_candidates=50)
    assert got, "retrieval produced candidates"
    cand = [d for d, _ in eng.search(Q, k=50)]
    tf = term_frequencies(df, "doc_id", "content").filter(
        __import__("pyspark.sql.functions", fromlist=["col"]).col("doc_id").isin(cand)
    )
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in maxsim_topk(tf, Q.split(), k=10).collect()
    ]
    assert got == want


def test_rerank_changes_order_but_not_candidates(built):
    eng, _ = built
    rer = eng.search_rerank_maxsim(Q, k=20, n_candidates=40)
    cand = {d for d, _ in eng.search(Q, k=40)}
    assert {d for d, _ in rer} <= cand
    # scores descend, ties on doc_id
    assert rer == sorted(rer, key=lambda t: (-t[1], t[0]))


def test_rerank_empty_query_no_hits(built):
    eng, _ = built
    assert eng.search_rerank_maxsim("zzzzqqqq notinvocab", k=5) == []
