"""Index-native aggregation surfaces: histogram facets, per-doc term
vectors, and significant-terms (ES ``histogram`` / Lucene ``TermVectors`` /
ES ``significant_terms`` JLH analogues).

Reference parity note: the reference has none of these; they are
engine-hardening surface over the same match-set / decode kernels, kept
honest by tf-truth identities here and DuckDB twins in the driver entries
(facet_histogram, term_vectors, significant_terms)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.postings import term_frequencies
from searchengine_spark.query.engine import SearchEngine

QUERY = "spark stream"


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 150)
        .cache()
    )


@pytest.fixture(scope="module")
def eng(spark, corpus, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("agg") / "idx"))
    e.build_index_from_df(
        corpus, id_col="doc_id", text_col="text", n_buckets=4, range_bits=2
    )
    return e


def _matched(spark, corpus, terms):
    tf = term_frequencies(corpus)
    return {
        r[0]
        for r in tf.filter(F.col("term").isin(terms))
        .select("doc_id")
        .distinct()
        .collect()
    }


def test_facet_histogram_equals_truth(spark, corpus, eng):
    got = {
        (r["bucket"], r["n"])
        for r in eng.facet_histogram(QUERY, corpus, "n_chars", 100.0).collect()
    }
    matched = _matched(spark, corpus, QUERY.split())
    truth: dict[float, int] = {}
    for r in corpus.select("doc_id", "n_chars").collect():
        if r["doc_id"] in matched:
            b = math.floor(r["n_chars"] / 100.0) * 100.0
            truth[b] = truth.get(b, 0) + 1
    assert got == set(truth.items()) and got
    # only non-empty buckets (min_doc_count=1)
    assert all(n > 0 for _, n in got)


def test_term_vectors_equals_tf_truth(spark, corpus, eng):
    ids = [r[0] for r in corpus.select("doc_id").orderBy("doc_id").limit(3).collect()]
    got = eng.term_vectors(ids).toPandas()
    assert set(got["doc_id"]) == set(ids)
    tf = term_frequencies(corpus).filter(F.col("doc_id").isin(ids)).toPandas()
    want = {(r.doc_id, r.term): r.tf for r in tf.itertuples()}
    assert {(r.doc_id, r.term): r.tf for r in got.itertuples()} == want
    # dl on every row is the doc's total token count
    dls = tf.groupby("doc_id")["tf"].sum().to_dict()
    assert all(dls[d] == dl for d, dl in zip(got["doc_id"], got["dl"]))


def test_term_vectors_empty_and_missing(eng):
    assert eng.term_vectors([]).count() == 0
    assert eng.term_vectors([999999999]).count() == 0


def test_term_vectors_respects_deletes(spark, corpus, tmp_path):
    e = SearchEngine(spark, str(tmp_path / "idx"))
    e.build_index_from_df(
        corpus, id_col="doc_id", text_col="text", n_buckets=4, range_bits=2
    )
    ids = [r[0] for r in corpus.select("doc_id").orderBy("doc_id").limit(2).collect()]
    e.delete_docs([ids[0]])
    got = set(e.term_vectors(ids).select("doc_id").distinct().toPandas()["doc_id"])
    assert got == {ids[1]}


def _sig_truth(spark, corpus, terms, top_n=10):
    tf = term_frequencies(corpus).toPandas()
    matched = set(tf[tf["term"].isin(terms)]["doc_id"])
    n = tf["doc_id"].nunique()
    fg_total = len(matched)
    fg = tf[tf["doc_id"].isin(matched)].groupby("term")["doc_id"].nunique()
    bg = tf.groupby("term")["doc_id"].nunique()
    rows = []
    for t, f in fg.items():
        fgp, bgp = f / fg_total, bg[t] / n
        rows.append((round((fgp - bgp) * (fgp / bgp), 6), t, int(f), int(bg[t])))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(t, f, b, s) for s, t, f, b in rows[:top_n]]


def test_significant_terms_equals_truth(spark, corpus, eng):
    got = [
        (r["term"], r["fg_df"], r["bg_df"], r["score"])
        for r in eng.significant_terms(QUERY, top_n=10).collect()
    ]
    assert got == _sig_truth(spark, corpus, QUERY.split(), top_n=10)
    # the query's own terms are in the candidate set and score positive
    assert any(t == "spark" for t, *_ in got)


def test_significant_terms_empty_match(spark, eng):
    assert eng.significant_terms("zzzznotaterm").count() == 0


def test_significant_terms_min_fg(spark, corpus, eng):
    got = eng.significant_terms(QUERY, top_n=50, min_fg=5).toPandas()
    assert (got["fg_df"] >= 5).all() and len(got)


def test_facet_date_histogram_equals_truth(spark, corpus, eng):
    import datetime

    meta = corpus.select(
        "doc_id",
        F.expr(
            "cast(date_add(date '2024-01-01', cast(doc_id % 540 as int)) "
            "as timestamp)"
        ).alias("ts"),
    )
    got = {
        (r["bucket"], r["n"])
        for r in eng.facet_date_histogram(QUERY, meta, "ts", "month").collect()
    }
    matched = _matched(spark, corpus, QUERY.split())
    truth: dict[str, int] = {}
    epoch = datetime.date(2024, 1, 1)
    for d in matched:
        ts = epoch + datetime.timedelta(days=d % 540)
        b = ts.replace(day=1).isoformat()
        truth[b] = truth.get(b, 0) + 1
    assert got == set(truth.items()) and len(got) > 1


def test_facet_percentiles_equals_numpy(spark, corpus, eng):
    import numpy as np

    got = eng.facet_percentiles(
        QUERY, corpus, "n_chars", [0.25, 0.5, 0.75], by="lang"
    ).collect()
    assert got and set(got[0].asDict()) == {"lang", "n", "p25", "p50", "p75"}
    matched = _matched(spark, corpus, QUERY.split())
    rows = [
        (r["lang"], r["n_chars"])
        for r in corpus.select("doc_id", "lang", "n_chars").collect()
        if r["doc_id"] in matched
    ]
    for r in got:
        vals = np.array(sorted(v for lg, v in rows if lg == r["lang"]))
        assert r["n"] == len(vals)
        # exact PERCENTILE_CONT == numpy's default linear interpolation
        for p, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
            assert r[col] == pytest.approx(
                float(np.percentile(vals, p * 100)), abs=1e-9
            )


def test_facet_percentiles_ungrouped(spark, corpus, eng):
    got = eng.facet_percentiles(QUERY, corpus, "n_chars", [0.5]).collect()
    assert len(got) == 1 and got[0]["n"] > 0 and got[0]["p50"] > 0


def test_facet_cardinality_exact(spark, corpus, eng):
    got = {
        r["lang"]: r["n_distinct"]
        for r in eng.facet_cardinality(QUERY, corpus, "source", by="lang").collect()
    }
    matched = _matched(spark, corpus, QUERY.split())
    truth: dict[str, set] = {}
    for r in corpus.select("doc_id", "lang", "source").collect():
        if r["doc_id"] in matched:
            truth.setdefault(r["lang"], set()).add(r["source"])
    assert got == {lg: len(s) for lg, s in truth.items()} and got


def test_facet_cardinality_approx_close(spark, corpus, eng):
    exact = eng.facet_cardinality(QUERY, corpus, "doc_id").collect()[0]["n_distinct"]
    approx = eng.facet_cardinality(QUERY, corpus, "doc_id", approx=True).collect()[0][
        "n_distinct"
    ]
    assert abs(approx - exact) <= max(3, 0.2 * exact)


def test_top_hits_equals_brute(spark, corpus):
    from searchengine_spark.postings import dictionary, doc_stats
    from searchengine_spark.scoring import bm25_score, top_hits

    tf = term_frequencies(corpus)
    stats, dct = doc_stats(tf), dictionary(tf)
    row = stats.agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")).collect()[0]
    scored = bm25_score(spark, tf, stats, dct, QUERY, int(row["n"]), float(row["a"]))
    got = {
        (r["lang"], r["doc_id"], r["hit_rank"])
        for r in top_hits(scored, corpus, "lang", 2, round_dp=5).collect()
    }
    langs = {r["doc_id"]: r["lang"] for r in corpus.select("doc_id", "lang").collect()}
    by_lang: dict[str, list] = {}
    for r in scored.collect():
        by_lang.setdefault(langs[r["doc_id"]], []).append(
            (round(r["score"], 5), r["doc_id"])
        )
    want = set()
    for lg, lst in by_lang.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for i, (_, d) in enumerate(lst[:2], start=1):
            want.add((lg, d, i))
    assert got == want and len(got) > 2


def test_facet_extended_stats_matches_numpy(spark, corpus, eng):
    import numpy as np

    got = {r["lang"]: r for r in
           eng.facet_extended_stats(QUERY, corpus, "n_chars", by="lang").collect()}
    matched = _matched(spark, corpus, QUERY.split())
    rows = [(r["lang"], r["n_chars"])
            for r in corpus.select("doc_id", "lang", "n_chars").collect()
            if r["doc_id"] in matched]
    assert got
    for lang, r in got.items():
        vals = np.array([v for lg, v in rows if lg == lang], dtype=np.float64)
        assert r["n"] == len(vals) and r["sum"] == vals.sum()
        assert r["sum_sq"] == pytest.approx((vals ** 2).sum(), rel=1e-12)
        assert r["variance"] == pytest.approx(vals.var(), rel=1e-9)
        assert r["std_dev"] == pytest.approx(vals.std(), rel=1e-9)
