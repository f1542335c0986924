"""parent_topk (scoring.py): ES has_child score modes over a literal
candidate set — brute-force expected values, tie order, k cut, and the
matching-children-only contract (parents with no scored child absent)."""

from __future__ import annotations

import pytest

from searchengine_spark.scoring import parent_topk

SCORED = [(1, 3.0), (2, 1.0), (3, 2.0), (4, 2.0), (6, 0.5)]
# doc 5 never scored; parent "c" has no matching children → absent
DOCS = [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c"), (6, "d")]


@pytest.fixture(scope="module")
def frames(spark):
    scored = spark.createDataFrame(SCORED, "doc_id long, score double")
    docs = spark.createDataFrame(DOCS, "doc_id long, src string")
    return scored, docs


def _run(frames, mode, k=10):
    scored, docs = frames
    return [
        (r["src"], r["score"], r["n_children"])
        for r in parent_topk(scored, docs, "src", k, score_mode=mode).collect()
    ]


def test_max_mode(frames):
    assert _run(frames, "max") == [("a", 3.0, 2), ("b", 2.0, 2), ("d", 0.5, 1)]


def test_sum_mode(frames):
    assert _run(frames, "sum") == [("a", 4.0, 2), ("b", 4.0, 2), ("d", 0.5, 1)]
    # tie at 4.0 broke by parent asc


def test_avg_mode(frames):
    got = _run(frames, "avg")
    assert got == [("a", 2.0, 2), ("b", 2.0, 2), ("d", 0.5, 1)]


def test_k_cut_and_rounding(frames):
    scored, docs = frames
    got = parent_topk(
        scored, docs, "src", 1, score_mode="sum", round_dp=2
    ).collect()
    assert len(got) == 1 and got[0]["src"] == "a"


def test_unknown_mode_raises(frames):
    scored, docs = frames
    with pytest.raises(ValueError):
        parent_topk(scored, docs, "src", 5, score_mode="median")


def test_no_unmatched_parents(frames):
    for mode in ("max", "sum", "avg"):
        assert all(p != "c" for p, _, _ in _run(frames, mode))
