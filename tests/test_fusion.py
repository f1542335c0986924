"""Reciprocal-rank fusion: rrf_fuse must equal a brute-force Python RRF
over any rankings, truncate each input to the window, and fuse batched
(per_query) rankings independently per query.

Reference parity note: the reference blends raw SCORES with fixed weights
(Part C/searcher.py); RRF is the scale-free rank-based hybrid it lacks —
`fusion.py` docstring carries the full rationale. Driver entry
`rrf_fusion` hash-checks BM25+cosine fusion against a DuckDB twin."""

from __future__ import annotations

import pytest

from searchengine_spark.fusion import rrf_fuse


def _brute(rankings, k, rank_constant=60, window=100):
    scores: dict[int, float] = {}
    for lst in rankings:
        ordered = sorted(lst, key=lambda t: (-t[1], t[0]))[:window]
        for r, (d, _) in enumerate(ordered, start=1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (rank_constant + r)
    out = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
    return [(d, s, i + 1) for i, (d, s) in enumerate(out)]


def _df(spark, rows, with_query=False):
    schema = (
        "query_id string, doc_id long, score double"
        if with_query
        else "doc_id long, score double"
    )
    return spark.createDataFrame(rows, schema)


def test_rrf_equals_brute_force(spark):
    a = [(1, 9.0), (2, 7.0), (3, 5.0), (4, 1.0)]
    b = [(3, 0.9), (5, 0.8), (1, 0.2)]
    got = [
        (r["doc_id"], r["score"], r["rank"])
        for r in rrf_fuse([_df(spark, a), _df(spark, b)], k=10)
        .orderBy("rank")
        .collect()
    ]
    want = _brute([a, b], k=10)
    assert [(d, r) for d, _, r in got] == [(d, r) for d, _, r in want]
    for (_, gs, _), (_, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-12)


def test_rrf_window_truncates_each_input(spark):
    # doc 9 is rank 3 in a with window=2 → contributes from b only
    a = [(1, 9.0), (2, 7.0), (9, 5.0)]
    b = [(9, 1.0), (1, 0.5)]
    got = {
        r["doc_id"]: r["score"]
        for r in rrf_fuse([_df(spark, a), _df(spark, b)], k=10, window=2).collect()
    }
    assert got[9] == pytest.approx(1.0 / 61)
    assert got[1] == pytest.approx(1.0 / 61 + 1.0 / 62)


def test_rrf_symmetric_ranks_tie_on_doc_id(spark):
    # docs 1 and 2 hold permuted ranks {1,2} → exactly equal fused score;
    # doc_id asc breaks the tie deterministically
    a = [(1, 9.0), (2, 7.0)]
    b = [(2, 9.0), (1, 7.0)]
    got = [
        (r["doc_id"], r["rank"])
        for r in rrf_fuse([_df(spark, a), _df(spark, b)], k=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, 1), (2, 2)]


def test_rrf_per_query_batched(spark):
    a = [("q1", 1, 9.0), ("q1", 2, 7.0), ("q2", 7, 3.0)]
    b = [("q1", 2, 0.9), ("q2", 8, 0.8), ("q2", 7, 0.1)]
    out = rrf_fuse(
        [_df(spark, a, True), _df(spark, b, True)], k=5, per_query=True
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert sorted(by_q["q1"]) == [(1, 2), (2, 1)]  # doc 2: ranks (2,1) beats 1: (1,-)
    assert sorted(by_q["q2"]) == [(1, 7), (2, 8)]


def test_rrf_rejects_empty(spark):
    with pytest.raises(ValueError):
        rrf_fuse([], k=5)
