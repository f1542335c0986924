"""Exact-substring duplicate spans (Lee et al. 2022 primitive): maximal
common token runs found relationally (positional shingles + diagonal
gaps-and-islands) must equal a brute-force all-substrings oracle, and the
scrubber must remove exactly the covered doc_b tokens."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops.dedup import (
    duplicate_spans,
    positional_shingles,
    scrub_duplicate_spans,
)
from searchengine_spark.tokenizer import STOPWORDS, TOKEN_PATTERN


def _toks(text):
    return [t for t in re.findall(TOKEN_PATTERN, text.lower()) if t not in STOPWORDS]


def _brute_spans(docs, w, min_len):
    """All maximal common runs ≥ min_len between every doc pair."""
    out = set()
    toks = {i: _toks(t) for i, t in docs}
    ids = sorted(toks)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            ta, tb = toks[a], toks[b]
            # dp over diagonals
            for diag in range(-(len(tb)), len(ta) + 1):
                run = 0
                lo = max(0, diag)
                hi = min(len(ta), len(tb) + diag)
                for i in range(lo, hi + 1):
                    j = i - diag
                    if i < hi and j < len(tb) and ta[i] == tb[j]:
                        run += 1
                    else:
                        if run >= min_len:
                            out.add((a, b, i - run, i - run - diag, run))
                        run = 0
    return out


DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "zzz alpha beta gamma delta epsilon zeta qqq eta theta iota kappa"),
    (3, "unrelated words entirely different content here nothing shared"),
    (4, "eta theta iota kappa alpha beta gamma delta epsilon zeta"),
    (5, "alpha beta gamma xxx alpha beta gamma delta yyy"),
]


@pytest.mark.parametrize("w,min_len", [(3, 3), (3, 4), (4, 5), (2, 2)])
def test_spans_match_brute(spark, w, min_len):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in duplicate_spans(df, w=w, min_len=min_len).collect()
    }
    assert got == _brute_spans(DOCS, w, min_len)


def test_spans_pair_driven_equals_full(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    full = duplicate_spans(df, w=3).collect()
    pairs = spark.createDataFrame(
        sorted({(r["doc_a"], r["doc_b"]) for r in full}), "doc_a long, doc_b long"
    )
    driven = duplicate_spans(df, w=3, candidates=pairs).collect()
    key = lambda r: (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_len"])
    assert sorted(map(key, full)) == sorted(map(key, driven))


def test_max_shingle_df_drops_hot_only(spark):
    # the shared run between 1 and 2 involves shingles with df=3+ when doc 4
    # shares them too; capping at 1 removes every cross-doc shingle → no spans
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = duplicate_spans(df, w=3, max_shingle_df=1).collect()
    assert got == []


def test_positional_shingles_positions(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma delta")], "doc_id long, text string")
    rows = sorted(
        (r["pos"], r["shingle"]) for r in positional_shingles(df, 2).collect()
    )
    assert rows == [(0, "alpha beta"), (1, "beta gamma"), (2, "gamma delta")]


def test_scrub_removes_covered_tokens(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    spans = duplicate_spans(df, w=3, min_len=3)
    out = {r["doc_id"]: r["scrubbed_text"] for r in scrub_duplicate_spans(df, spans).collect()}
    # every doc present
    assert set(out) == {1, 2, 3, 4, 5}
    # doc 3 shares nothing → full token stream preserved
    assert out[3] == " ".join(_toks(DOCS[2][1]))
    # recompute expectation in python: doc_b tokens minus covered positions
    spans_rows = spans.collect()
    for did, text in DOCS:
        toks = _toks(text)
        covered = set()
        for r in spans_rows:
            if r["doc_b"] == did:
                covered.update(range(r["start_b"], r["start_b"] + r["span_len"]))
        want = " ".join(t for i, t in enumerate(toks) if i not in covered)
        assert out[did] == want


def test_scrub_fully_covered_doc_becomes_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    spans = duplicate_spans(df, w=2, min_len=2)
    out = {r["doc_id"]: r["scrubbed_text"] for r in scrub_duplicate_spans(df, spans).collect()}
    assert out[1] == "alpha beta gamma delta"
    assert out[2] == ""
