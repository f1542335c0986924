"""Winnowing fingerprints (MOSS): pure-Python reference identity, the
w+k-1 detection guarantee, rightmost tie-break, and pair detection."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import code as C
from searchengine_spark.tokenizer import STOPWORDS, TOKEN_PATTERN

K, W = 3, 4


def _py_winnow(text: str, k: int, w: int) -> set[tuple[str, int]]:
    toks = [t for t in re.findall(TOKEN_PATTERN, text.lower())
            if t not in STOPWORDS]
    grams = ["\x01".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    keys = [
        hashlib.md5(g.encode()).hexdigest()[:15]
        + str(C._WPOS_MAX - i).zfill(6)
        for i, g in enumerate(grams)
    ]
    sel = {min(keys[i:i + w]) for i in range(0, len(keys) - w + 1)}
    return {(key[:15], C._WPOS_MAX - int(key[15:])) for key in sel}


def test_matches_python_reference(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "spark streams join tables while ducks quack loudly at dawn"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got: dict[int, set] = {}
    for r in C.winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
    for did, text in texts:
        assert got.get(did, set()) == _py_winnow(text, K, W), did


def test_shared_run_guarantee(spark):
    """Any shared token run of length >= w + k - 1 yields >= 1 shared fp."""
    shared = "lexical analysis chooses minimal window hashes deterministically"
    assert len(shared.split()) >= W + K - 1
    df = spark.createDataFrame(
        [
            (0, "totally unrelated prefix words here " + shared),
            (1, shared + " followed by a different suffix entirely"),
            (2, "nothing in common with either document whatsoever"),
        ],
        ["doc_id", "text"],
    )
    fps = C.winnow_fingerprints(df, k=K, w=W)
    pairs = {(r["doc_a"], r["doc_b"]): r["shared"]
             for r in C.winnow_pairs(fps, min_shared=1).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_rightmost_tie_break(spark):
    """A perfectly periodic doc makes every k-gram hash equal — the
    selected position inside each window must be the RIGHTMOST one."""
    df = spark.createDataFrame([(0, "zig zag " * 12)], ["doc_id", "text"])
    rows = C.winnow_fingerprints(df, k=2, w=3).collect()
    want = _py_winnow("zig zag " * 12, 2, 3)
    assert {(r["fp"], r["pos"]) for r in rows} == want
    # periodic with period 2 and k=2: two alternating hashes; the smaller
    # one is picked at its rightmost slot per window
    assert len({r["fp"] for r in rows}) <= 2


def test_short_docs_and_validation(spark):
    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, "")], ["doc_id", "text"]
    )
    assert C.winnow_fingerprints(df, k=K, w=W).count() == 0
    with pytest.raises(ValueError):
        C.winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        C.winnow_fingerprints(df, w=0)


def test_pairs_threshold(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    fps = C.winnow_fingerprints(docs, k=4, w=5)
    p1 = C.winnow_pairs(fps, min_shared=1)
    p3 = C.winnow_pairs(fps, min_shared=3)
    c1, c3 = p1.count(), p3.count()
    assert c3 <= c1
    assert p3.filter(F.col("shared") < 3).count() == 0
    for r in p3.limit(20).collect():
        assert r["doc_a"] < r["doc_b"]
