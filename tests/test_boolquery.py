"""Nested bool DSL (boolquery.py): ES semantics on a hand-enumerable
fixture — must conjunction + score sum, should msm gating, filter
(match, no score), must_not exclusion, nesting — plus the SQL twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.boolquery import BoolContext, bool_score, bool_score_sql
from searchengine_spark.postings import (
    corpus_stats,
    dictionary,
    doc_stats,
    term_frequencies,
)

DOCS = [
    (1, "apple banana cherry", 10),
    (2, "apple banana", 20),
    (3, "apple cherry date", 30),
    (4, "banana cherry", 40),
    (5, "apple", 50),
]


@pytest.fixture(scope="module")
def ctx(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, n_chars long")
    tf = term_frequencies(docs, "doc_id", "text", use_arrow_udf=False)
    stats = doc_stats(tf)
    n, avgdl = corpus_stats(stats)
    return BoolContext(spark, tf, stats, dictionary(tf), n, avgdl, metadata=docs)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_must_is_conjunctive_and_sums(ctx):
    out = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "apple"}, {"term": "banana"}]}).collect()}
    assert sorted(out) == [1, 2]
    one = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "apple"}]}).collect()}
    two = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "banana"}]}).collect()}
    for d in (1, 2):
        assert out[d] == pytest.approx(one[d] + two[d], abs=2e-5)


def test_should_msm_gates_membership(ctx):
    tree = {"should": [{"term": "apple"}, {"term": "banana"}, {"term": "cherry"}]}
    assert _ids(bool_score(ctx, tree)) == [1, 2, 3, 4, 5]  # default msm 1
    tree["minimum_should_match"] = 2
    assert _ids(bool_score(ctx, tree)) == [1, 2, 3, 4]
    tree["minimum_should_match"] = 3
    assert _ids(bool_score(ctx, tree)) == [1]


def test_filter_matches_without_scoring(ctx):
    scored = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "apple"}]}).collect()}
    filtered = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "apple"}],
              "filter": [{"range": {"field": "n_chars", "gte": 15, "lte": 35}}]}
    ).collect()}
    assert sorted(filtered) == [2, 3]
    for d in (2, 3):
        assert filtered[d] == scored[d]  # filter added no score


def test_must_not_excludes(ctx):
    out = _ids(bool_score(
        ctx, {"must": [{"term": "apple"}], "must_not": [{"term": "cherry"}]}))
    assert out == [2, 5]


def test_pure_filter_tree_scores_zero(ctx):
    out = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"filter": [{"range": {"field": "n_chars", "gte": 30}}]}).collect()}
    assert out == {3: 0.0, 4: 0.0, 5: 0.0}


def test_nested_tree_matches_duckdb(spark, ctx):
    import duckdb

    tree = {
        "must": [{"term": "apple"},
                 {"should": [{"term": "banana"}, {"term": "date"}]}],
        "should": [{"term": "cherry"}],
        "must_not": [{"range": {"field": "n_chars", "gte": 45}}],
    }
    got = sorted((r["doc_id"], r["score"]) for r in bool_score(ctx, tree).collect())
    con = duckdb.connect()
    con.register("docs", spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long").toPandas())
    tf_sql = ("SELECT doc_id, t.term AS term, count(*) AS tf FROM "
              "(SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs) t(doc_id, term) "
              "GROUP BY 1, 2")
    # match the engine tf shape: (doc_id, term, tf)
    sql = bool_score_sql(tree, tf_sql, meta_table="docs")
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_empty_node_raises(ctx):
    with pytest.raises(ValueError, match="clause"):
        bool_score(ctx, {"must_not": [{"term": "apple"}]})
