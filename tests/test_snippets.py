"""Best-window snippet extraction (Lucene highlighter analogue) over the
positional index: per matching doc, the window-token span holding the most
distinct query terms (ties: more total matches, then leftmost)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.tokenizer import tokenize_py


def _brute_best(tokens: list[str], qterms: set[str], window: int):
    """Reference implementation: scan every match-anchored window."""
    matches = [(p, t) for p, t in enumerate(tokens) if t in qterms]
    if not matches:
        return None
    best = None
    for p, _ in matches:
        inwin = [(q, t) for q, t in matches if p <= q < p + window]
        key = (-len({t for _, t in inwin}), -len(inwin), p)
        if best is None or key < best[0]:
            best = (key, p, max(q for q, _ in inwin), len({t for _, t in inwin}),
                    len(inwin))
    _, start, end, n_terms, n_matches = best
    return (start, end, n_terms, n_matches)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 120)
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("sidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2, with_positions=True)
    return e


@pytest.fixture(scope="module")
def texts(spark):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 120)
        .collect()
    }


def test_matches_brute_force_on_corpus(eng, texts):
    q = "spark stream join"
    window = 5
    got = {
        r["doc_id"]: (r["start"], r["end"], r["n_terms"], r["n_matches"])
        for r in eng.snippets(q, window=window).collect()
    }
    qterms = set(tokenize_py(q))
    want = {}
    for doc_id, text in texts.items():
        b = _brute_best(tokenize_py(text), qterms, window)
        if b is not None:
            want[doc_id] = b
    assert got == want and got


def test_fixture_semantics(spark, tmp_path):
    # doc 1: both terms adjacent late beats early single match;
    # doc 2: only 'spark' — window is the leftmost match alone
    rows = [
        (1, "spark big big big big big big stream spark big"),
        (2, "big big spark big big spark"),
        (3, "stream stream big stream"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    e = SearchEngine(spark, str(tmp_path / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=2, range_bits=1, with_positions=True)
    got = {
        r["doc_id"]: (r["start"], r["end"], r["n_terms"], r["n_matches"])
        for r in e.snippets("spark stream", window=3).collect()
    }
    assert got[1] == (7, 8, 2, 2)  # stream@7, spark@8 — two distinct terms
    assert got[2] == (2, 2, 1, 1)  # leftmost spark, window holds only it
    assert got[3] == (0, 1, 1, 2)  # anchors 0 and 1 tie on 2 matches → leftmost


def test_requires_positions(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, "spark stream")], "doc_id long, text string"
    )
    e = SearchEngine(spark, str(tmp_path / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=2, range_bits=1)
    with pytest.raises(ValueError, match="positions"):
        e.snippets("spark")


def test_oov_and_filter(eng):
    assert eng.snippets("qqqq zzz").count() == 0
    base = {r["doc_id"] for r in eng.snippets("spark").collect()}
    allow = set(sorted(base)[::2])
    got = {r["doc_id"] for r in eng.snippets("spark", doc_filter=allow).collect()}
    assert got == allow
