"""Two-phase rescoring (ES ``rescore`` API): primary window → secondary
scored over the window only → weighted combine. Checked against a
brute-force composition of two independent searches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine

DOCS = "/root/testdata/sf0.001/documents.parquet"
Q1 = "spark join stream"
Q2 = "table scan"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = (
        spark.read.parquet(DOCS)
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("rescidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def _brute(eng, qw, rw, mode, window, k):
    prim = eng.search(Q1, k=window)
    sec = dict(eng.search(Q2, k=10_000, use_wand=False))
    out = []
    for d, p in prim:
        wp = qw * p
        if d in sec:
            ws = rw * sec[d]
            s = {
                "total": wp + ws,
                "multiply": wp * ws,
                "avg": (wp + ws) / 2.0,
                "max": max(wp, ws),
                "min": min(wp, ws),
            }[mode]
        else:
            s = wp
        out.append((d, s))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


@pytest.mark.parametrize("mode", ["total", "multiply", "avg", "max", "min"])
def test_rescore_matches_bruteforce(eng, mode):
    got = eng.rescore(Q1, Q2, k=15, window_size=50,
                      query_weight=1.0, rescore_query_weight=2.0,
                      score_mode=mode)
    want = _brute(eng, 1.0, 2.0, mode, 50, 15)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9


def test_rescore_never_resurrects_beyond_window(eng):
    """A doc outside the primary window cannot appear, however well it
    matches the rescore query."""
    window = 5
    got = eng.rescore(Q1, Q2, k=5, window_size=window,
                      rescore_query_weight=100.0)
    window_ids = {d for d, _ in eng.search(Q1, k=window)}
    assert {d for d, _ in got} <= window_ids


def test_rescore_nonmatching_keep_weighted_primary(eng):
    """rw=0 reduces every combined score to qw·primary — the window order
    must equal the primary order."""
    got = eng.rescore(Q1, Q2, k=10, window_size=40, rescore_query_weight=0.0)
    prim = eng.search(Q1, k=10)
    assert [d for d, _ in got] == [d for d, _ in prim]


def test_rescore_validation(eng):
    with pytest.raises(ValueError):
        eng.rescore(Q1, Q2, k=10, window_size=5)
    with pytest.raises(ValueError):
        eng.rescore(Q1, Q2, score_mode="sum")
    assert eng.rescore("zzznope qqqnada", Q2, k=5, window_size=10) == []
