"""Benchmark decontamination: n-gram overlap flagging must find exactly
the train docs sharing ≥min_overlap distinct w-grams with the benchmark
set, report the right overlap fraction, and the anti-join must remove
exactly the flagged docs.

Reference parity note: no reference counterpart — this is a first-class
training-data-pipeline op (driver brief); the driver entry
`decontamination` hash-checks it against a DuckDB shingle-join twin."""

from __future__ import annotations

import pytest

from searchengine_spark.ops.dedup import contaminated_pairs, decontaminate

TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely unrelated text about spark distributed computing engines"),
    (3, "quick brown fox jumps over something else entirely today"),
    (4, "tiny"),  # fewer than w tokens → no shingles, never flagged
]
BENCH = [
    (100, "quick brown fox jumps over the lazy dog"),
    (101, "distributed computing engines are nice"),
]


@pytest.fixture(scope="module")
def dfs(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    return train, bench


def _shingles(text, w):
    # replicate the shingle token stream: regex tokens, lowercased,
    # stopwords removed (ops/dedup.shingle_array → tokenize_raw_expr)
    import re

    from searchengine_spark.tokenizer import STOPWORDS, TOKEN_PATTERN

    toks = [
        t for t in re.findall(TOKEN_PATTERN, text.lower()) if t not in STOPWORDS
    ]
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_pairs_match_brute_force(spark, dfs):
    train, bench = dfs
    w = 3
    got = {
        (r["doc_id"], r["bench_id"]): (r["n_overlap"], r["overlap_frac"])
        for r in contaminated_pairs(train, bench, w=w).collect()
    }
    want = {}
    for tid, ttext in TRAIN:
        ts = _shingles(ttext.lower(), w)
        for bid, btext in BENCH:
            ov = len(ts & _shingles(btext.lower(), w))
            if ov >= 1:
                want[(tid, bid)] = (ov, round(ov / len(ts), 5))
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    for k in want:
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-9)
    assert (1, 100) in got and (3, 100) in got and (2, 101) in got
    assert all(k[0] != 4 for k in got)


def test_min_overlap_threshold(spark, dfs):
    train, bench = dfs
    got = {
        (r["doc_id"], r["bench_id"]): r["n_overlap"]
        for r in contaminated_pairs(train, bench, w=3, min_overlap=3).collect()
    }
    assert all(v >= 3 for v in got.values()) and (1, 100) in got
    assert (2, 101) not in got  # only 1 shared trigram


def test_decontaminate_removes_flagged_only(spark, dfs):
    train, bench = dfs
    kept = {r["doc_id"] for r in decontaminate(train, bench, w=3).collect()}
    assert kept == {4}
    kept_strict = {
        r["doc_id"] for r in decontaminate(train, bench, w=3, min_overlap=4).collect()
    }
    assert kept_strict == {2, 3, 4}


def test_shuffle_join_fallback_identical(spark, dfs):
    train, bench = dfs
    a = contaminated_pairs(train, bench, w=3).collect()
    b = contaminated_pairs(train, bench, w=3, broadcast_bench=False).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
