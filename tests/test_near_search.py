"""Index-native proximity (NEAR) search: terms within a token window of the
filtered token stream, unordered or in query order, verified against a
brute-force Python oracle over the tokenized text and against kernel
identities (phrase ≡ ordered NEAR at window m-1 with adjacency-tight spans).

Reference parity note: the reference has no proximity operator; this
generalizes the positional phrase kernel (SURVEY.md §2.7+)."""

from __future__ import annotations

from itertools import product

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def corpus_rows(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    )


@pytest.fixture(scope="module")
def eng(spark, corpus_rows, tmp_path_factory):
    df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("nidx") / "idx"))
    e.build_index_from_df(df, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2, with_positions=True)
    return e


def _brute_near(rows, terms, window, ordered):
    """Ground-truth matched doc_ids by exhaustive combination check."""
    out = set()
    for r in rows:
        toks = tokenize_py(r["text"])
        pos = {t: [i for i, x in enumerate(toks) if x == t]
               for t in set(terms)}
        if any(not p for p in pos.values()):
            continue
        if ordered:
            combos = product(*(pos[t] for t in terms))
            hit = any(
                all(c[i] < c[i + 1] for i in range(len(c) - 1))
                and c[-1] - c[0] <= window
                for c in combos
            )
        else:
            distinct = sorted(set(terms))
            combos = product(*(pos[t] for t in distinct))
            hit = any(max(c) - min(c) <= window for c in combos)
        if hit:
            out.add(r["doc_id"])
    return out


def _expect(and_ranked, matched, k):
    return [(d, s) for d, s in and_ranked if d in matched][:k]


def _assert_ranked_equal(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-12)


@pytest.mark.parametrize("q,window", [("spark join", 3), ("spark join", 8)])
def test_unordered_near_vs_brute_force(eng, corpus_rows, q, window):
    terms = tokenize_py(q)
    matched = _brute_near(corpus_rows, terms, window, ordered=False)
    assert matched  # the window must actually select something
    and_ranked = eng.search(" ".join(sorted(set(terms))), k=500, mode="and")
    # window selectivity: a tight window must be a strict subset of AND
    if window == 3:
        assert len(matched) < len(and_ranked)
    got = eng.search_near(q, window=window, k=25)
    _assert_ranked_equal(got, _expect(and_ranked, matched, 25))


def test_three_term_near_both_modes(eng, corpus_rows):
    q = "table row key"
    terms = tokenize_py(q)
    and_ranked = eng.search(" ".join(sorted(set(terms))), k=500, mode="and")
    for ordered in (False, True):
        matched = _brute_near(corpus_rows, terms, 6, ordered)
        got = eng.search_near(q, window=6, k=25, ordered=ordered)
        _assert_ranked_equal(got, _expect(and_ranked, matched, 25))
    # ordered is a subset of unordered at equal window
    uo = {d for d, _ in eng.search_near(q, window=6, k=500)}
    od = {d for d, _ in eng.search_near(q, window=6, k=500, ordered=True)}
    assert od <= uo


def test_ordered_near_at_tight_window_equals_phrase(eng):
    """Strictly increasing positions with span ≤ m-1 forces adjacency, so
    ordered NEAR(m-1) must be doc-identical to the exact phrase kernel
    (scores too — same BM25 accumulation)."""
    for q in ("spark join", "the spark", "table row key"):
        m = len(tokenize_py(q))
        near = eng.search_near(q, window=m - 1, k=100, ordered=True)
        phrase = eng.search_phrase(q, k=100)
        _assert_ranked_equal(near, phrase)


def test_single_term_and_degenerate_inputs(eng):
    base = eng.search("spark", k=100, mode="and")
    got = eng.search_near("spark", window=0, k=100)
    _assert_ranked_equal(got, base)
    assert eng.search_near("zzzmissingterm spark", window=5, k=10) == []
    assert eng.search_near("the of", window=5, k=10) == []  # stopwords only
    with pytest.raises(ValueError):
        eng.search_near("spark join", window=-1)


def test_near_respects_doc_filter_and_window_zero(eng, corpus_rows):
    q = "spark join"
    full = eng.search_near(q, window=8, k=500)
    assert len(full) > 3
    allow = {d for d, _ in full[::2]}
    got = eng.search_near(q, window=8, k=10, doc_filter=allow)
    _assert_ranked_equal(got, [(d, s) for d, s in full if d in allow][:10])
    # window=0 with two distinct terms can never match (two terms can't
    # share one position)
    assert eng.search_near(q, window=0, k=10) == []


def test_near_requires_positions(spark, corpus_rows, tmp_path):
    df = spark.createDataFrame(corpus_rows[:50], "doc_id long, text string")
    e = SearchEngine(spark, str(tmp_path / "idx"))
    e.build_index_from_df(df, id_col="doc_id", text_col="text",
                          n_buckets=2, range_bits=1)
    with pytest.raises(ValueError, match="positions"):
        e.search_near("spark join", window=3)
