"""Percolation (reverse search) and field-sorted retrieval.

Both are checked against brute-force Python oracles built on the same
tokenizer, plus the consistency claim that makes them meaningful:
a percolate hit for query q means the forward engine's match set for q
contains the doc, and ``search_sorted`` is exactly "match set ordered by
the metadata column".

Reference parity note: the reference has neither surface; these are
engine-completion analogues of its forward search path (SURVEY.md §2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.percolate import percolate
from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.tokenizer import tokenize_py

DOCS = "/root/testdata/sf0.001/documents.parquet"

QUERIES = [
    ("q_or", "spark join stream", "or"),
    ("q_and", "hash merge sort", "and"),
    ("q_mixed_case", "SPARK Join", "OR"),
    ("q_stop", "the of and", "or"),   # stopword-only -> matches nothing
    ("q_oov", "zzqqxx spark", "and"),  # OOV term -> AND matches nothing
]


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(DOCS)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text", "n_chars")
        .cache()
    )


@pytest.fixture(scope="module")
def doc_rows(docs):
    return [(r["doc_id"], r["text"], r["n_chars"]) for r in docs.collect()]


def _brute_percolate(doc_rows, queries):
    out = set()
    for did, text, _ in doc_rows:
        toks = set(tokenize_py(text))
        for qid, q, mode in queries:
            terms = set(tokenize_py(q))
            if not terms:
                continue
            hit = (
                bool(terms & toks)
                if mode.lower() == "or"
                else terms <= toks
            )
            if hit:
                out.add((did, qid))
    return out


def test_percolate_matches_bruteforce(spark, docs, doc_rows):
    q = spark.createDataFrame(QUERIES, "query_id string, query string, mode string")
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, q).collect()
    }
    want = _brute_percolate(doc_rows, QUERIES)
    assert got == want
    # sanity: the fixture exercises both modes and the empty-query rule
    assert any(k[1] == "q_or" for k in want)
    assert any(k[1] == "q_and" for k in want)
    assert not any(k[1] in ("q_stop", "q_oov") for k in want)


def test_percolate_default_mode_is_or(spark, docs, doc_rows):
    q = spark.createDataFrame(
        [("a", "spark join stream")], "query_id string, query string"
    )
    got = {
        r["doc_id"]
        for r in percolate(docs, q, mode_col=None).collect()
    }
    want = {
        d for d, qid in _brute_percolate(doc_rows, [("a", "spark join stream", "or")])
    }
    assert got == want and got


@pytest.fixture(scope="module")
def eng(spark, docs, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("psidx") / "idx"))
    e.build_index_from_df(docs, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def test_percolate_agrees_with_forward_search(spark, docs, eng):
    """A percolate hit == membership in the forward engine's match set."""
    q = spark.createDataFrame(QUERIES, "query_id string, query string, mode string")
    perc = {}
    for r in percolate(docs, q).collect():
        perc.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, query, mode in QUERIES:
        fwd = {
            r["doc_id"]
            for r in eng.matching_docs(query, mode=mode.lower()).collect()
        }
        assert perc.get(qid, set()) == fwd, qid


@pytest.mark.parametrize("ascending", [False, True])
def test_search_sorted_matches_bruteforce(eng, docs, doc_rows, ascending):
    query, mode, k = "spark join stream", "or", 12
    match = {r["doc_id"] for r in eng.matching_docs(query, mode=mode).collect()}
    assert len(match) > k  # truncation actually exercised
    rows = [(d, n) for d, _, n in doc_rows if d in match]
    rows.sort(key=lambda t: (t[1] if ascending else -t[1], t[0]))
    got = eng.search_sorted(query, docs, "n_chars", k=k, ascending=ascending)
    assert got == rows[:k]


def test_search_sorted_and_mode_and_small_match(eng, docs, doc_rows):
    query = "hash merge sort"
    match = {
        r["doc_id"] for r in eng.matching_docs(query, mode="and").collect()
    }
    rows = [(d, n) for d, _, n in doc_rows if d in match]
    rows.sort(key=lambda t: (-t[1], t[0]))
    got = eng.search_sorted(query, docs, "n_chars", k=500,
                            ascending=False, mode="and")
    assert got == rows  # k > |match set| returns the whole set, ordered
