"""Corpus term analytics: significant terms, TF-IDF keywords, PMI
collocations, bigram-LM perplexity. DuckDB-twin equality for each, plus
behavioral checks (lift direction, keyword sanity, LM out-of-domain
ordering, filter semantics) and edge cases (short docs, empty strata)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from searchengine_spark.ops import termstats

ROWS = [
    (1, "py", "def parse tokens from the index fast value"),
    (2, "py", "parse tokens parse tokens index build fast"),
    (3, "js", "async await promise callback value fast"),
    (4, "js", "callback promise async module value"),
    (5, "py", "index build merge segments fast value parse"),
    (6, "js", "promise callback async await module build"),
    (7, "py", "x"),  # single token → no bigrams
    (8, "js", ""),  # empty → no tokens at all
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "lang", "text"]))
    return con


def _assert_twin(sdf, con, sql):
    cols = sorted(sdf.columns)
    s = sdf.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    o = con.execute(sql).fetchdf()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)
    return s


def test_significant_terms_twin_and_lift(docs, duck):
    out = _assert_twin(
        termstats.significant_terms(docs, top_n=5, min_doc_count=2),
        duck,
        termstats.significant_terms_sql("documents", top_n=5, min_doc_count=2),
    )
    by_cat = {c: set(g["term"]) for c, g in out.groupby("category")}
    # category-exclusive terms are the most significant ones
    assert "parse" in by_cat["py"] and "promise" in by_cat["js"]
    # a term present in BOTH categories at background rate has no lift
    assert "value" not in by_cat["py"] or "value" not in by_cat["js"]
    assert (out["score"] > 0).all()


def test_keyword_tfidf_twin_and_sanity(docs, duck):
    out = _assert_twin(
        termstats.keyword_tfidf(docs, k=3),
        duck,
        termstats.keyword_tfidf_sql("documents", k=3),
    )
    # ≤ k keywords per doc; repeated in-doc term ranks first for doc 2
    assert out.groupby("doc_id").size().max() <= 3
    d2 = out[out.doc_id == 2].sort_values("rnk")
    assert list(d2["term"])[0] in ("parse", "tokens")  # tf=2 each
    # the empty doc has no keywords
    assert 8 not in set(out["doc_id"])


def test_collocations_twin_and_order(docs, duck):
    out = _assert_twin(
        termstats.collocations(docs, min_count=2, top_n=10),
        duck,
        termstats.collocations_sql("documents", min_count=2, top_n=10),
    )
    assert len(out) > 0
    # 'async await' is a genuine collocation in the js docs
    pairs = set(zip(out["term_a"], out["term_b"]))
    assert ("async", "await") in pairs
    # every surviving pair meets the min count
    assert (out["pair_count"] >= 2).all()


def test_perplexity_twin_and_short_docs(docs, duck):
    out = _assert_twin(
        termstats.perplexity(docs),
        duck,
        termstats.perplexity_sql("documents"),
    )
    # docs with < 2 tokens have no bigram stream → absent on both sides
    assert 7 not in set(out["doc_id"]) and 8 not in set(out["doc_id"])
    assert (out["ppl"] >= 1.0).all()


def test_perplexity_out_of_domain_scores_higher(spark, docs):
    """A doc made of corpus-unseen bigrams must look more surprising to
    the corpus LM than an in-domain doc (the CCNet filter premise)."""
    model = termstats.bigram_lm_counts(docs)
    probe = spark.createDataFrame(
        [
            (100, "parse tokens index build fast"),  # in-domain
            (101, "zebra quark nebula fjord glyph"),  # out-of-domain
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["ppl"]
        for r in termstats.perplexity(probe, model=model).collect()
    }
    assert out[101] > out[100]


def test_perplexity_filter_keeps_short_docs(spark, docs):
    kept = termstats.perplexity_filter(docs, max_ppl=1e9)
    # nothing filtered at a huge threshold, short/empty docs included
    assert kept.count() == len(ROWS)
    tight = termstats.perplexity_filter(docs, max_ppl=1.0)
    ids = {r["doc_id"] for r in tight.select("doc_id").collect()}
    # only the bigram-free docs survive ppl ≤ 1 (they carry no evidence)
    assert ids == {7, 8}


def test_significant_terms_min_doc_count_gate(docs, duck):
    # with min_doc_count=1, hapax terms may enter; the twin must still agree
    _assert_twin(
        termstats.significant_terms(docs, top_n=3, min_doc_count=1),
        duck,
        termstats.significant_terms_sql("documents", top_n=3, min_doc_count=1),
    )


def test_bigram_stream_is_post_stopword_adjacency(spark):
    """Adjacency is defined on the FILTERED stream: 'index of the build'
    yields the bigram (index, build) because stopwords drop out first."""
    df = spark.createDataFrame(
        [(1, "index of the build")], "doc_id long, text string"
    )
    bi = termstats._bigram_stream(df).collect()
    assert [(r["term_a"], r["term_b"]) for r in bi] == [("index", "build")]


def test_significant_text_twin_and_exclusion(docs, duck):
    out = _assert_twin(
        termstats.significant_text(docs, ["parse"], top_n=5, min_doc_count=2),
        duck,
        termstats.significant_text_sql("documents", ["parse"], top_n=5, min_doc_count=2),
    )
    # the query term itself is excluded; survivors have positive lift
    assert "parse" not in set(out["term"])
    assert (out["score"] > 0).all()
    # terms characteristic of the parse-hit docs (py corpus) surface
    assert {"index", "tokens"} & set(out["term"])


def test_significant_text_empty_query_raises(docs):
    with pytest.raises(ValueError):
        termstats.significant_text(docs, [])
