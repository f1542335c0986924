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


def test_dis_max_best_field_and_tie_breaker(ctx):
    """tie_breaker=0 → pure max of sub scores; 0<t<1 adds t·(others);
    membership = union of the subs (doc 4 matches via banana only)."""
    apple = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "apple"}]}).collect()}
    banana = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "banana"}]}).collect()}
    best = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"dis_max": [{"term": "apple"}, {"term": "banana"}]}).collect()}
    assert sorted(best) == sorted(set(apple) | set(banana))
    for d in best:
        want = max(apple.get(d, -1e9), banana.get(d, -1e9))
        assert best[d] == pytest.approx(want, abs=2e-5)
    tb = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"dis_max": [{"term": "apple"}, {"term": "banana"}],
              "tie_breaker": 0.4}).collect()}
    for d in (1, 2):  # docs matching BOTH subs get max + 0.4·min
        lo, hi = sorted((apple[d], banana[d]))
        assert tb[d] == pytest.approx(hi + 0.4 * lo, abs=2e-5)
    for d in tb:
        if d not in (1, 2):
            assert tb[d] == pytest.approx(best[d], abs=2e-5)


def test_boosting_demotes_without_excluding(ctx):
    """Docs matching the negative query stay in the result with score ×
    negative_boost; everyone else keeps the positive score unchanged."""
    pos = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"must": [{"term": "apple"}]}).collect()}
    out = {r["doc_id"]: r["score"] for r in bool_score(
        ctx, {"positive": {"must": [{"term": "apple"}]},
              "negative": {"must": [{"term": "cherry"}]},
              "negative_boost": 0.25}).collect()}
    assert sorted(out) == sorted(pos)  # no exclusion, unlike must_not
    for d, s in out.items():
        if d in (1, 3):  # contain cherry → demoted
            assert s == pytest.approx(pos[d] * 0.25, abs=2e-5)
        else:
            assert s == pytest.approx(pos[d], abs=2e-5)


def test_dismax_boosting_tree_matches_duckdb(spark, ctx):
    """Compound tree nesting dis_max inside boosting inside bool — the
    SQL twin must mirror every combinator branch exactly."""
    import duckdb

    tree = {
        "must": [
            {"positive": {"dis_max": [{"term": "apple"}, {"term": "banana"}],
                          "tie_breaker": 0.3},
             "negative": {"must": [{"term": "date"}]},
             "negative_boost": 0.2},
        ],
        "should": [{"dis_max": [{"term": "cherry"}]}],
    }
    got = sorted((r["doc_id"], r["score"]) for r in bool_score(ctx, tree).collect())
    con = duckdb.connect()
    con.register("docs", spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long").toPandas())
    tf_sql = ("SELECT doc_id, t.term AS term, count(*) AS tf FROM "
              "(SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs) t(doc_id, term) "
              "GROUP BY 1, 2")
    sql = bool_score_sql(tree, tf_sql, meta_table="docs")
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


# ------------------------------------------------- property: membership
def _matches(node, doc_terms: set, n_chars: int) -> bool:
    """Brute-force membership twin of bool_score (ignores scores)."""
    if "term" in node:
        return node["term"] in doc_terms
    if "range" in node:
        r = node["range"]
        return (r.get("gte", -10**9) <= n_chars) and (n_chars <= r.get("lte", 10**9))
    must = node.get("must", [])
    filt = node.get("filter", [])
    should = node.get("should", [])
    must_not = node.get("must_not", [])
    if any(not _matches(c, doc_terms, n_chars) for c in must + filt):
        return False
    if any(_matches(c, doc_terms, n_chars) for c in must_not):
        return False
    msm = node.get("minimum_should_match", 0 if (must or filt) else 1)
    n_should = sum(_matches(c, doc_terms, n_chars) for c in should)
    if should and n_should < max(msm, 0 if (must or filt) else 1):
        return False
    return True


def test_membership_property_random_trees(ctx):
    """Random nested trees: bool_score's match set == the brute-force
    evaluator on every fixture doc (deterministic seed, 25 trees)."""
    import random

    rng = random.Random(20240818)
    TERMS = ["apple", "banana", "cherry", "date"]

    def rand_leaf():
        if rng.random() < 0.8:
            return {"term": rng.choice(TERMS)}
        lo, hi = sorted(rng.sample([5, 15, 25, 35, 45, 55], 2))
        return {"range": {"field": "n_chars", "gte": lo, "lte": hi}}

    def rand_node(depth):
        node = {}
        for key, p in (("must", 0.7), ("should", 0.7), ("must_not", 0.4),
                       ("filter", 0.3)):
            if rng.random() < p:
                kids = [
                    rand_node(depth - 1) if depth > 0 and rng.random() < 0.3
                    else rand_leaf()
                    for _ in range(rng.randint(1, 2))
                ]
                # range leaves only in filter context (scoring contexts
                # require BM25-scorable leaves in this DSL)
                if key in ("must", "should"):
                    kids = [
                        k if "range" not in k else {"term": rng.choice(TERMS)}
                        for k in kids
                    ]
                node[key] = kids
        if not (node.get("must") or node.get("filter") or node.get("should")):
            node["must"] = [{"term": rng.choice(TERMS)}]
        if node.get("should") and rng.random() < 0.4:
            node["minimum_should_match"] = rng.randint(1, 2)
        return node

    docs_info = {
        d: (set(t.split()), n) for d, t, n in DOCS
    }
    for _ in range(25):
        tree = rand_node(2)
        got = set(_ids(bool_score(ctx, tree)))
        want = {d for d, (ts, n) in docs_info.items() if _matches(tree, ts, n)}
        assert got == want, (tree, got, want)


def test_index_native_equals_relational(spark, ctx, tmp_path):
    """engine.search_bool over a built index == bool_score over the raw
    relations for the same tree (leaf frames come from segments vs
    corpus joins; the shared combinators must align them exactly)."""
    from searchengine_spark.query.engine import SearchEngine

    docs = spark.createDataFrame(DOCS, "doc_id long, text string, n_chars long")
    eng = SearchEngine(spark, str(tmp_path / "bidx"))
    eng.build_index_from_df(docs, id_col="doc_id", text_col="text",
                            n_buckets=2, range_bits=1)
    tree = {
        "must": [{"term": "apple"},
                 {"should": [{"term": "banana"}, {"term": "date"}]}],
        "should": [{"term": "cherry"}],
        "must_not": [{"range": {"field": "n_chars", "gte": 45}}],
    }
    got = eng.search_bool(tree, k=10, metadata=docs)
    want = sorted(
        ((r["doc_id"], r["score"]) for r in bool_score(ctx, tree).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == want
