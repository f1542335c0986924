"""Lucene-style query-string front-end (querylang.py +
SearchEngine.search_query_string): parser unit tests + end-to-end
composition against brute-force truth on a real corpus slice.

The reference has no query language (plain-text OR only,
``Part C/searcher.py:38``); driver entry query_string_topk hash-checks the
full composition (SHOULD + MUST + phrase + filter + MUST_NOT) against a
DuckDB twin built from the SAME parse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.querylang import parse_query_string
from searchengine_spark.tokenizer import tokenize_py


def test_parse_clause_types():
    p = parse_query_string('+sort stream "merge sort" lang:en -dup')
    assert p.must == ["sort"]
    assert p.should == ["stream"]
    assert p.phrases == ["merge sort"]
    assert p.filters == [("lang", "en")]
    assert p.must_not == ["dup"]
    # positive terms: should + must + phrase tokens, first-seen dedup
    assert p.positive_terms == ["stream", "sort", "merge"]


def test_parse_normalization_and_stopwords():
    # clauses are tokenizer-normalized; stopword-only clauses are dropped
    p = parse_query_string("+The Spark -OF table")
    assert p.must == [] and p.must_not == []
    assert p.should == ["spark", "table"]
    # a stopword inside a phrase is fine (adjacency over the filtered stream)
    p2 = parse_query_string('"merge the sort"')
    assert p2.phrases == ["merge the sort"]
    # stopword-only phrase is dropped
    assert parse_query_string('"the of"').phrases == []


def test_parse_edge_forms():
    p = parse_query_string('a:b:c -neg +pos plain')
    assert p.filters == [("a", "b:c")]
    assert p.must_not == ["neg"] and p.must == ["pos"] and p.should == ["plain"]
    with pytest.raises(ValueError, match="negated phrases"):
        parse_query_string('-"no such"')


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def eng(spark, corpus, tmp_path_factory):
    from searchengine_spark.query.engine import SearchEngine

    e = SearchEngine(spark, str(tmp_path_factory.mktemp("qsidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          range_bits=2, n_buckets=4, with_positions=True)
    return e


@pytest.fixture(scope="module")
def toks(corpus):
    return {r["doc_id"]: tokenize_py(r["text"]) for r in corpus.collect()}


def _has_phrase(tok_list, phrase):
    ph = tokenize_py(phrase)
    return any(
        tok_list[i : i + len(ph)] == ph for i in range(len(tok_list) - len(ph) + 1)
    )


def test_qs_composition_matches_bruteforce(spark, corpus, eng, toks):
    qs = 'stream "merge sort" -dup'
    hits = eng.search_query_string(qs, k=10_000)
    got = {d for d, _ in hits}
    want = {
        d
        for d, t in toks.items()
        if _has_phrase(t, "merge sort") and "dup" not in t
        and ({"stream", "merge", "sort"} & set(t))
    }
    assert got == want and got  # non-vacuous


def test_qs_must_and_filter(spark, corpus, eng, toks):
    langs = {r["doc_id"]: r["lang"] for r in corpus.select("doc_id", "lang").collect()}
    hits = eng.search_query_string("+sort +merge stream lang:en", k=10_000,
                                   metadata=corpus)
    got = {d for d, _ in hits}
    want = {
        d for d, t in toks.items()
        if "sort" in t and "merge" in t and langs[d] == "en"
    }
    assert got == want and got


def test_qs_scores_are_plain_bm25_over_positive_terms(spark, eng):
    """Constraints are filter-context: surviving docs keep the score the
    plain OR query gives them."""
    qs_hits = dict(eng.search_query_string('stream +sort "merge sort"', k=10_000))
    or_hits = dict(eng.search("stream sort merge", k=100_000))
    for d, s in qs_hits.items():
        assert s == pytest.approx(or_hits[d], abs=1e-12)


def test_qs_oov_semantics(spark, eng):
    # OOV MUST term empties the result; OOV MUST_NOT is a no-op
    assert eng.search_query_string("stream +zzznotaterm", k=100) == []
    base = eng.search_query_string("stream", k=50)
    assert eng.search_query_string("stream -zzznotaterm", k=50) == base
    # OOV phrase term empties the result
    assert eng.search_query_string('stream "zzznotaterm sort"', k=100) == []


def test_qs_validation(spark, eng, corpus):
    with pytest.raises(ValueError, match="no positive terms"):
        eng.search_query_string("-dup", k=10)
    with pytest.raises(ValueError, match="metadata"):
        eng.search_query_string("stream lang:en", k=10)


def test_qs_lm_scorer_composes(spark, eng):
    hits = eng.search_query_string("stream +sort", k=20, scorer="lm")
    assert hits
    lm_plain = dict(eng.search("stream sort", k=100_000, scorer="lm"))
    for d, s in hits:
        assert s == pytest.approx(lm_plain[d], abs=1e-12)


def test_parse_boosts_and_ranges():
    p = parse_query_string('stream^2 +sort^0.5 "merge sort"^4 n_chars:[150 TO 400]')
    assert p.should == ["stream"] and p.must == ["sort"]
    assert p.phrases == ["merge sort"]
    # phrase boost applies to each phrase token; max-combine with ^0.5
    assert p.boosts == {"stream": 2.0, "sort": 4.0, "merge": 4.0}
    assert p.ranges == [("n_chars", "150", "400")]
    # open ends + malformed boost falls through as literal text (dies in
    # the tokenizer, Lucene-lenient)
    p2 = parse_query_string("n_chars:[* TO 99] x:[a TO *] stream^fast")
    assert p2.ranges == [("n_chars", None, "99"), ("x", "a", None)]
    assert p2.should == ["stream", "fast"]  # '^' split by the tokenizer
    with pytest.raises(ValueError, match="MUST_NOT.*boost"):
        parse_query_string("stream -dup^2")


def test_qs_boost_scales_scores_exactly(spark, eng):
    """term^2 doubles that term's contribution: a single-term boosted
    query scores exactly 2× the unboosted one (power-of-two scaling of
    float64 is exact)."""
    plain = dict(eng.search("stream", k=10_000))
    boosted = dict(eng.search_query_string("stream^2", k=10_000))
    assert boosted.keys() == plain.keys() and plain
    for d, s in plain.items():
        assert boosted[d] == 2.0 * s
    # multi-term: boost changes the ranking vs plain OR on some corpus
    plain2 = eng.search_query_string("stream scan", k=10_000)
    boosted2 = eng.search_query_string("stream^8 scan", k=10_000)
    assert dict(boosted2) != dict(plain2)


def test_qs_range_filter(spark, eng, corpus, toks):
    nchars = {r["doc_id"]: r["n_chars"]
              for r in corpus.select("doc_id", "n_chars").collect()}
    hits = eng.search_query_string("stream n_chars:[150 TO 400]", k=10_000,
                                   metadata=corpus)
    got = {d for d, _ in hits}
    want = {d for d, t in toks.items()
            if "stream" in t and 150 <= nchars[d] <= 400}
    assert got == want and got
    # open upper end
    hits2 = eng.search_query_string("stream n_chars:[400 TO *]", k=10_000,
                                    metadata=corpus)
    got2 = {d for d, _ in hits2}
    assert got2 == {d for d, t in toks.items()
                    if "stream" in t and nchars[d] >= 400}


def test_qs_boost_lm_refused(spark, eng):
    with pytest.raises(ValueError, match="rewriters"):
        eng.search_query_string("stream^2", k=10, scorer="lm")


def test_parser_never_crashes_on_arbitrary_input():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=60))
    def run(s):
        try:
            p = parse_query_string(s)
        except ValueError:
            return  # the one documented refusal: negated phrases
        # invariants: every clause list holds tokenizer-normal terms
        for t in p.should + p.must + p.must_not:
            assert tokenize_py(t) == [t]

    run()
