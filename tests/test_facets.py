"""Matched-set extraction + facet counts over the FULL match set
(Solr/Elasticsearch facet semantics): distributed end-to-end, aggregated
with map-side partials — the match set never hits the driver.

Reference parity note: the reference has no facets; engine-hardening
surface kept honest by the facet_lang_or / facet_source_and driver
entries' DuckDB twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.postings import term_frequencies
from searchengine_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)


@pytest.fixture()
def eng(spark, corpus, tmp_path):
    e = SearchEngine(spark, str(tmp_path / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def _truth_matched(spark, corpus, terms, mode):
    tf = term_frequencies(corpus)
    m = tf.filter(F.col("term").isin(terms))
    if mode == "and":
        return {
            r[0]
            for r in m.groupBy("doc_id")
            .agg(F.countDistinct("term").alias("nt"))
            .filter(F.col("nt") == len(terms))
            .select("doc_id")
            .collect()
        }
    return {r[0] for r in m.select("doc_id").distinct().collect()}


@pytest.mark.parametrize("mode", ["or", "and"])
def test_matching_docs_equals_tf_truth(spark, corpus, eng, mode):
    got = {r[0] for r in eng.matching_docs("spark stream", mode).collect()}
    want = _truth_matched(spark, corpus, ["spark", "stream"], mode)
    assert got == want and got


def test_and_with_oov_term_is_empty(eng):
    assert eng.matching_docs("spark qqqq", "and").count() == 0
    # OR mode ignores the OOV term
    assert eng.matching_docs("spark qqqq", "or").count() > 0


def test_facet_counts_match_join_truth(spark, corpus, eng):
    got = {
        (r["lang"], r["n"])
        for r in eng.facet_counts("spark stream", corpus, "lang").collect()
    }
    matched = _truth_matched(spark, corpus, ["spark", "stream"], "or")
    truth = (
        corpus.filter(F.col("doc_id").isin(list(matched)))
        .groupBy("lang")
        .count()
    )
    want = {(r["lang"], r["count"]) for r in truth.collect()}
    assert got == want


def test_deleted_docs_leave_the_match_set(eng, corpus):
    before = {r[0] for r in eng.matching_docs("spark", "or").collect()}
    victim = sorted(before)[0]
    eng.delete_docs([victim])
    after = {r[0] for r in eng.matching_docs("spark", "or").collect()}
    assert after == before - {victim}


def test_doc_filter_restricts_match_set(eng):
    base = sorted(r[0] for r in eng.matching_docs("spark", "or").collect())
    allow = set(base[::2])
    got = {r[0] for r in eng.matching_docs("spark", "or", doc_filter=allow).collect()}
    assert got == allow


def test_facet_stats_matches_truth(spark, corpus, eng):
    """facet_stats = ES stats aggregation per facet value over the full
    match set."""
    truth_ids = _truth_matched(spark, corpus, ["merge", "sort"], "or")
    rows = corpus.filter(F.col("doc_id").isin(list(truth_ids))).collect()
    want: dict[str, list[int]] = {}
    for r in rows:
        want.setdefault(r["lang"], []).append(r["n_chars"])
    got = {
        r["lang"]: r
        for r in eng.facet_stats("merge sort", corpus, "n_chars", by="lang").collect()
    }
    assert set(got) == set(want)
    for lang, vals in want.items():
        g = got[lang]
        assert (g["n"], g["min"], g["max"], g["sum"]) == (
            len(vals), min(vals), max(vals), sum(vals)
        )
        assert g["avg"] == pytest.approx(sum(vals) / len(vals))
    # ungrouped variant aggregates the whole match set
    tot = eng.facet_stats("merge sort", corpus, "n_chars").collect()[0]
    assert tot["n"] == len(truth_ids)


def test_composite_pagination_walks_full_bucket_space(spark, corpus, eng):
    """Composite agg: pages in key order, strictly-after cursor, and the
    concatenation of all pages equals the one-shot facet truth exactly —
    every bucket once, no gaps, no dups."""
    full = {
        (r["lang"], r["source"]): r["n"]
        for r in eng.facet_composite(
            "spark stream", corpus, ["lang", "source"], size=10_000
        ).collect()
    }
    assert len(full) > 5
    walked = {}
    after, pages = None, 0
    while True:
        page = eng.facet_composite(
            "spark stream", corpus, ["lang", "source"], size=4, after=after
        ).collect()
        if not page:
            break
        keys = [(r["lang"], r["source"]) for r in page]
        assert keys == sorted(keys)  # in-page key order
        for r in page:
            k = (r["lang"], r["source"])
            assert k not in walked  # strictly-after: no overlap
            walked[k] = r["n"]
        after = keys[-1]
        pages += 1
        assert pages < 100
    assert walked == full
    assert pages == -(-len(full) // 4)

    with pytest.raises(ValueError):
        eng.facet_composite("spark", corpus, [], size=4)
    with pytest.raises(ValueError):
        eng.facet_composite("spark", corpus, ["lang"], size=4, after=("a", "b"))
