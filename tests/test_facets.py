"""Matched-set extraction + facet counts over the FULL match set
(Solr/Elasticsearch facet semantics): distributed end-to-end, aggregated
with map-side partials — the match set never hits the driver.

Reference parity note: the reference has no facets; engine-hardening
surface kept honest by the facet_lang_or / facet_source_and driver
entries' DuckDB twins."""

from __future__ import annotations

import math

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


def test_range_buckets_overlap_and_empties(spark, corpus, eng):
    """ES range agg: overlapping buckets each count the doc, empty buckets
    appear with n=0, bounds are half-open [lo, hi)."""
    ids = _truth_matched(spark, corpus, ["spark", "stream"], "or")
    vals = {
        r["doc_id"]: r["n_chars"]
        for r in corpus.select("doc_id", "n_chars").collect()
        if r["doc_id"] in ids
    }
    lo, hi = min(vals.values()), max(vals.values())
    mid = (lo + hi) // 2
    ranges = [
        ("low", None, mid),          # open start
        ("high", mid, None),         # open end
        ("all", None, None),         # overlaps both
        ("empty", hi + 10, hi + 20),  # beyond the data
        ("point", lo, lo + 1),        # boundary: lo inclusive, lo+1 exclusive
    ]
    got = {
        r["bucket"]: r["n"]
        for r in eng.facet_range(
            "spark stream", corpus, "n_chars", ranges
        ).collect()
    }
    assert got == {
        "low": sum(1 for v in vals.values() if v < mid),
        "high": sum(1 for v in vals.values() if v >= mid),
        "all": len(vals),
        "empty": 0,
        "point": sum(1 for v in vals.values() if v == lo),
    }
    assert got["low"] + got["high"] == got["all"]
    with pytest.raises(ValueError):
        eng.facet_range("spark", corpus, "n_chars", [])
    with pytest.raises(ValueError):
        eng.facet_range("spark", corpus, "n_chars",
                        [("a", 0, 1), ("a", 1, 2)])


def test_filters_buckets_are_independent(spark, corpus, eng):
    """ES filters agg: one bucket per named predicate, a doc counts toward
    every filter it satisfies; empty buckets kept at 0."""
    ids = _truth_matched(spark, corpus, ["spark", "stream"], "or")
    rows = {
        r["doc_id"]: r
        for r in corpus.collect()
        if r["doc_id"] in ids
    }
    filters = {
        "english": "lang = 'en'",
        "longish": "n_chars >= 300",
        "both": "lang = 'en' AND n_chars >= 300",
        "nothing": "n_chars < 0",
    }
    got = {
        r["filter"]: r["n"]
        for r in eng.facet_filters("spark stream", corpus, filters).collect()
    }
    en = sum(1 for r in rows.values() if r["lang"] == "en")
    lg = sum(1 for r in rows.values() if r["n_chars"] >= 300)
    both = sum(1 for r in rows.values()
               if r["lang"] == "en" and r["n_chars"] >= 300)
    assert got == {"english": en, "longish": lg, "both": both, "nothing": 0}
    # independence: a doc satisfying two filters is counted in each
    assert both > 0 and got["english"] >= both and got["longish"] >= both
    with pytest.raises(ValueError):
        eng.facet_filters("spark", corpus, {})


def test_rare_terms_is_the_low_tail(spark, corpus, eng):
    ids = _truth_matched(spark, corpus, ["spark", "stream"], "or")
    srcs = [
        r["source"] for r in corpus.select("doc_id", "source").collect()
        if r["doc_id"] in ids
    ]
    from collections import Counter
    cnt = Counter(srcs)
    for mdc in (1, 2, 3):
        got = {
            r["source"]: r["n"]
            for r in eng.facet_rare_terms(
                "spark stream", corpus, "source", max_doc_count=mdc
            ).collect()
        }
        assert got == {s: n for s, n in cnt.items() if n <= mdc}
    with pytest.raises(ValueError):
        eng.facet_rare_terms("spark", corpus, "source", max_doc_count=0)


def test_adjacency_matrix_pairs(spark, corpus, eng):
    ids = _truth_matched(spark, corpus, ["spark", "stream"], "or")
    rows = [r for r in corpus.collect() if r["doc_id"] in ids]
    filters = {
        "en": "lang = 'en'",
        "de": "lang = 'de'",
        "long": "n_chars >= 300",
    }
    preds = {
        "en": lambda r: r["lang"] == "en",
        "de": lambda r: r["lang"] == "de",
        "long": lambda r: r["n_chars"] >= 300,
    }
    got = {
        r["key"]: r["n"]
        for r in eng.facet_adjacency_matrix(
            "spark stream", corpus, filters
        ).collect()
    }
    names = sorted(filters)
    want = {}
    for i, a in enumerate(names):
        for b in names[i:]:
            key = a if a == b else f"{a}&{b}"
            n = sum(1 for r in rows if preds[a](r) and preds[b](r))
            if n > 0:
                want[key] = n
    assert got == want
    assert "de&en" not in got  # disjoint langs: empty bucket omitted
    assert any("&" in k for k in got)  # some real intersection surfaced
    with pytest.raises(ValueError):
        eng.facet_adjacency_matrix("spark", corpus, {})


def test_matrix_stats_matches_numpy(spark, corpus, eng):
    import numpy as np

    ids = _truth_matched(spark, corpus, ["spark", "stream"], "or")
    meta = corpus.withColumn(
        "n2", (F.col("n_chars") % 7 + F.col("doc_id") % 13).cast("double")
    )
    rows = [r for r in meta.collect() if r["doc_id"] in ids]
    x = np.array([r["n_chars"] for r in rows], dtype=float)
    y = np.array([r["n2"] for r in rows], dtype=float)
    got = {
        (r["field_a"], r["field_b"]): r
        for r in eng.facet_matrix_stats(
            "spark stream", meta, ["n_chars", "n2"]
        ).collect()
    }
    assert set(got) == {("n_chars", "n_chars"), ("n_chars", "n2"), ("n2", "n2")}
    d = got[("n_chars", "n2")]
    assert d["n"] == len(rows)
    assert d["mean_a"] == pytest.approx(x.mean())
    assert d["mean_b"] == pytest.approx(y.mean())
    assert d["covariance"] == pytest.approx(np.cov(x, y, ddof=1)[0, 1])
    assert d["correlation"] == pytest.approx(np.corrcoef(x, y)[0, 1])
    diag = got[("n_chars", "n_chars")]
    assert diag["covariance"] == pytest.approx(x.var(ddof=1))
    assert diag["correlation"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        eng.facet_matrix_stats("spark", meta, ["n_chars"])


def test_diversified_sampler_cap_and_order(spark, corpus, eng):
    """ES diversified_sampler: ≤ max_docs_per_value docs per field value,
    the survivors are exactly the per-value best-scoring docs, and the
    sample is the global top-shard_size of the capped set."""
    max_per, size = 2, 10
    out = eng.diversified_sampler(
        "index merge", corpus, "source",
        max_docs_per_value=max_per, shard_size=size, round_dp=5,
    ).collect()
    assert 0 < len(out) <= size
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert max(per.values()) <= max_per

    # brute force twin from the full scored set
    scored = {
        r["doc_id"]: round(r["score"], 5)
        for r in eng.scored_docs("index merge").collect()
    }
    src = {r["doc_id"]: r["source"] for r in corpus.collect()}
    by_val = {}
    for d, s in sorted(scored.items(), key=lambda kv: (-kv[1], kv[0])):
        lst = by_val.setdefault(src[d], [])
        if len(lst) < max_per:
            lst.append((d, s))
    capped = [x for lst in by_val.values() for x in lst]
    want = sorted(capped, key=lambda x: (-x[1], x[0]))[:size]
    assert sorted((r["doc_id"], r["score"]) for r in out) == sorted(want)


def test_date_histogram_pipeline_aggs(spark, corpus, eng):
    """cumulative_sum / derivative / moving_fn avg over the monthly
    histogram, checked against a brute recomputation from the plain
    histogram buckets."""
    meta = corpus.select(
        "doc_id",
        F.expr(
            "cast(date_add(date '2024-01-01', cast(doc_id % 200 as int))"
            " as timestamp)"
        ).alias("ts"),
    )
    plain = sorted(
        (r["bucket"], r["n"])
        for r in eng.facet_date_histogram("index merge", meta, "ts").collect()
    )
    got = {
        r["bucket"]: (r["n"], r["cum_n"], r["diff_n"], r["moving_avg"])
        for r in eng.facet_date_histogram_pipeline(
            "index merge", meta, "ts", window=2, round_dp=5
        ).collect()
    }
    assert len(plain) > 2
    cum = 0
    prev = None
    for i, (b, n) in enumerate(plain):
        cum += n
        mov = [x for _, x in plain[max(0, i - 1):i + 1]]
        want = (n, cum, None if prev is None else n - prev,
                round(sum(mov) / len(mov), 5))
        assert got[b] == want, b
        prev = n
    import pytest as _pt

    with _pt.raises(ValueError):
        eng.facet_date_histogram_pipeline("index merge", meta, "ts", window=0)


def test_percentile_ranks_inverse_of_counts(spark, corpus, eng):
    """percentile_ranks = 100·|{v ≤ probe}|/n over the match set, and it
    inverts facet_percentiles: rank(pctl(p)) ≥ 100p."""
    meta = corpus.select("doc_id", "n_chars", "lang")
    probes = [150.0, 300.0]
    out = eng.facet_percentile_ranks("stream", meta, "n_chars", probes).collect()[0]
    matched = _truth_matched(spark, corpus, ["stream"], "or")
    vals = [
        r["n_chars"]
        for r in corpus.filter(F.col("doc_id").isin(list(matched))).collect()
    ]
    assert out["n"] == len(vals)
    for p in probes:
        want = 100.0 * sum(1 for v in vals if v <= p) / len(vals)
        key = f"rank_{str(round(p, 4)).rstrip('0').rstrip('.')}"
        assert abs(out[key] - want) < 1e-9
    # inverse property vs the percentiles facet
    pct = eng.facet_percentiles("stream", meta, "n_chars", [0.5]).collect()[0]
    r_of_median = (
        100.0 * sum(1 for v in vals if v <= pct["p50"]) / len(vals)
    )
    assert r_of_median >= 50.0
    with pytest.raises(ValueError):
        eng.facet_percentile_ranks("stream", meta, "n_chars", [])


def _matched_vals(spark, corpus, terms, col="n_chars"):
    ids = _truth_matched(spark, corpus, terms, "or")
    return [
        r
        for r in corpus.filter(F.col("doc_id").isin(list(ids))).collect()
    ]


def test_weighted_avg_matches_python(spark, corpus, eng):
    """weighted_avg = Σ(v·w)/Σ(w) with the scripted weight (doc_id%7)+1."""
    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    num = sum(r["n_chars"] * ((r["doc_id"] % 7) + 1) for r in rows)
    den = sum((r["doc_id"] % 7) + 1 for r in rows)
    got = eng.facet_weighted_avg(
        "merge sort", corpus, "n_chars", (F.col("doc_id") % 7 + 1)
    ).collect()[0]
    assert got["n"] == len(rows)
    assert got["weighted_avg"] == pytest.approx(num / den)
    # string weight_col form (self-weighted: Σv²/Σv)
    got2 = eng.facet_weighted_avg(
        "merge sort", corpus, "n_chars", "n_chars"
    ).collect()[0]
    num2 = sum(r["n_chars"] * r["n_chars"] for r in rows)
    den2 = sum(r["n_chars"] for r in rows)
    assert got2["weighted_avg"] == pytest.approx(num2 / den2)


def test_boxplot_matches_numpy(spark, corpus, eng):
    import numpy as np

    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    got = {
        r["lang"]: r
        for r in eng.facet_boxplot(
            "merge sort", corpus, "n_chars", by="lang"
        ).collect()
    }
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        g, a = got[lang], np.asarray(vals, dtype=float)
        assert (g["min"], g["max"], g["n"]) == (min(vals), max(vals), len(vals))
        for q, col in [(25, "q1"), (50, "q2"), (75, "q3")]:
            assert g[col] == pytest.approx(
                np.percentile(a, q, method="linear")
            )
        assert g["iqr"] == pytest.approx(g["q3"] - g["q1"])


def test_mad_matches_numpy(spark, corpus, eng):
    import numpy as np

    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    a = np.asarray([r["n_chars"] for r in rows], dtype=float)
    want = np.percentile(np.abs(a - np.percentile(a, 50)), 50)
    got = eng.facet_median_absolute_deviation(
        "merge sort", corpus, "n_chars"
    ).collect()[0]
    assert got["n"] == len(a)
    assert got["mad"] == pytest.approx(want)


def test_string_stats_entropy_matches_python(spark, corpus, eng):
    import math
    from collections import Counter

    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    texts = [r["text"] for r in rows]
    lens = [len(t) for t in texts]
    cnt = Counter("".join(texts))
    tot = sum(cnt.values())
    want_ent = -sum((c / tot) * math.log2(c / tot) for c in cnt.values())
    got = eng.facet_string_stats("merge sort", corpus, "text").collect()[0]
    assert got["n"] == len(texts)
    assert (got["min_length"], got["max_length"]) == (min(lens), max(lens))
    assert got["avg_length"] == pytest.approx(sum(lens) / len(lens))
    assert got["entropy"] == pytest.approx(want_ent)


def test_top_metrics_cut_is_deterministic(spark, corpus, eng):
    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    want = sorted(rows, key=lambda r: (-r["n_chars"], r["doc_id"]))[:3]
    got = eng.facet_top_metrics(
        "merge sort", corpus, "n_chars", ["lang"], size=3
    ).collect()
    assert [(r["doc_id"], r["n_chars"]) for r in got] == [
        (r["doc_id"], r["n_chars"]) for r in want
    ]
    # ascending form takes the shortest
    got_asc = eng.facet_top_metrics(
        "merge sort", corpus, "n_chars", ["lang"], size=2, ascending=True
    ).collect()
    want_asc = sorted(rows, key=lambda r: (r["n_chars"], r["doc_id"]))[:2]
    assert [r["doc_id"] for r in got_asc] == [r["doc_id"] for r in want_asc]


def test_t_test_matches_welch_numpy(spark, corpus, eng):
    import numpy as np

    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    a = np.asarray(
        [r["n_chars"] for r in rows if r["lang"] == "en"], dtype=float
    )
    b = np.asarray(
        [r["n_chars"] for r in rows if r["lang"] == "de"], dtype=float
    )
    assert len(a) > 1 and len(b) > 1
    se_a, se_b = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    want_t = (a.mean() - b.mean()) / math.sqrt(se_a + se_b)
    want_df = (se_a + se_b) ** 2 / (
        se_a**2 / (len(a) - 1) + se_b**2 / (len(b) - 1)
    )
    got = eng.facet_t_test(
        "merge sort", corpus, "n_chars", "lang", "en", "de"
    ).collect()[0]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert got["t"] == pytest.approx(want_t)
    assert got["df"] == pytest.approx(want_df)


def test_bucket_selector_matches_python(spark, corpus, eng):
    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    got = {
        r["source"]: (r["n"], r["sum"])
        for r in eng.facet_bucket_selector(
            "merge sort", corpus, "source", "n_chars",
            (F.col("n") >= 2) & (F.col("sum") > 300),
        ).collect()
    }
    want = {
        s: (len(v), sum(v))
        for s, v in by_src.items()
        if len(v) >= 2 and sum(v) > 300
    }
    assert got == want
    # SQL-string having form
    got2 = {
        r["source"]
        for r in eng.facet_bucket_selector(
            "merge sort", corpus, "source", "n_chars", "n >= 2 AND sum > 300"
        ).collect()
    }
    assert got2 == set(want)


def test_bucket_sort_pagination(spark, corpus, eng):
    rows = _matched_vals(spark, corpus, ["merge", "sort"])
    by_src: dict[str, int] = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + r["n_chars"]
    ranked = sorted(by_src.items(), key=lambda kv: (-kv[1], kv[0]))
    got = eng.facet_bucket_sort(
        "merge sort", corpus, "source", "n_chars",
        sort_by="sum", size=3, from_=1,
    ).collect()
    assert [(r["source"], r["sum"], r["bucket_rank"]) for r in got] == [
        (s, v, i + 2) for i, (s, v) in enumerate(ranked[1:4])
    ]
    with pytest.raises(ValueError):
        eng.facet_bucket_sort("merge sort", corpus, "source", "n_chars",
                              sort_by="median")


def _geo(corpus):
    return corpus.select(
        "doc_id",
        (F.expr("doc_id * 7919 % 18000") / 100.0 - 90.0).alias("lat"),
        (F.expr("doc_id * 104729 % 36000") / 100.0 - 180.0).alias("lon"),
    )


def test_geo_bounds_and_centroid(spark, corpus, eng):
    ids = _truth_matched(spark, corpus, ["merge", "sort"], "or")
    pts = [((d * 7919 % 18000) / 100.0 - 90.0, (d * 104729 % 36000) / 100.0 - 180.0)
           for d in ids]
    b = eng.facet_geo_bounds("merge sort", _geo(corpus)).collect()[0]
    assert b["n"] == len(pts)
    assert (b["top"], b["bottom"]) == (max(p[0] for p in pts), min(p[0] for p in pts))
    assert (b["left"], b["right"]) == (min(p[1] for p in pts), max(p[1] for p in pts))
    c = eng.facet_geo_centroid("merge sort", _geo(corpus)).collect()[0]
    assert c["lat"] == pytest.approx(sum(p[0] for p in pts) / len(pts), abs=1e-4)
    assert c["lon"] == pytest.approx(sum(p[1] for p in pts) / len(pts), abs=1e-4)


def _ts_meta(corpus):
    return corpus.select(
        "doc_id",
        F.expr(
            "cast(date_add(date '2024-01-01', cast(doc_id % 90 as int)) as timestamp)"
        ).alias("ts"),
    )


def test_date_range_bounds_semantics(spark, corpus, eng):
    import datetime

    ids = _truth_matched(spark, corpus, ["merge", "sort"], "or")
    days = {d: d % 90 for d in ids}
    epoch = datetime.date(2024, 1, 1)
    cut = (datetime.date(2024, 2, 1) - epoch).days
    got = {r["range_key"]: r["n"] for r in eng.facet_date_range(
        "merge sort", _ts_meta(corpus), "ts",
        [("jan", None, "2024-02-01"), ("feb_on", "2024-02-01", None),
         ("none", "2030-01-01", None)],
    ).collect()}
    want_jan = sum(1 for v in days.values() if v < cut)
    assert got == {"jan": want_jan, "feb_on": len(days) - want_jan, "none": 0}
    with pytest.raises(ValueError):
        eng.facet_date_range("merge sort", _ts_meta(corpus), "ts", [])


def test_auto_date_histogram_picks_interval(spark, corpus, eng):
    ids = _truth_matched(spark, corpus, ["merge", "sort"], "or")
    span = (max(d % 90 for d in ids) - min(d % 90 for d in ids)) * 86400
    rows = eng.facet_auto_date_histogram(
        "merge sort", _ts_meta(corpus), "ts", target_buckets=10
    ).collect()
    iv = rows[0]["interval_sec"]
    # the chosen interval is the smallest ladder step fitting 10 buckets
    ladder = SearchEngine.AUTO_HIST_LADDER
    assert iv == next(s for s in ladder if span // s + 1 <= 10)
    assert sum(r["n"] for r in rows) == len(ids)
    assert len(rows) <= 10
    for r in rows:
        assert r["bucket"] % iv == 0


def test_serial_diff_stats_bucket_multi_terms(spark, corpus, eng):
    """The three sibling aggs added round 3: serial_diff (lag-2
    differencing), stats_bucket (one-row stats over bucket values), and
    multi_terms (compound-key top buckets) — all brute-checked from the
    plain histogram / match set."""
    meta = corpus.select(
        "doc_id",
        F.expr(
            "cast(date_add(date '2024-01-01', cast(doc_id % 200 as int))"
            " as timestamp)"
        ).alias("ts"),
    )
    plain = sorted(
        (r["bucket"], r["n"])
        for r in eng.facet_date_histogram("index merge", meta, "ts").collect()
    )
    got = {
        r["bucket"]: r["sdiff"]
        for r in eng.facet_date_histogram_serial_diff(
            "index merge", meta, "ts", lag=2
        ).collect()
    }
    for i, (b, n) in enumerate(plain):
        want = None if i < 2 else n - plain[i - 2][1]
        assert got[b] == want, b

    sb = eng.facet_stats_bucket("index merge", meta, "ts").collect()[0]
    ns = [n for _, n in plain]
    assert (sb["buckets"], sb["min_n"], sb["max_n"], sb["sum_n"]) == (
        len(ns), min(ns), max(ns), sum(ns)
    )
    assert abs(sb["avg_n"] - round(sum(ns) / len(ns), 5)) < 1e-9

    mt = eng.facet_multi_terms(
        "index merge", corpus, ["lang", "source"], k=5
    ).collect()
    from collections import Counter

    matched = _truth_matched(spark, corpus, ["index", "merge"], "or")
    truth = Counter(
        (r["lang"], r["source"])
        for r in corpus.select("doc_id", "lang", "source").collect()
        if r["doc_id"] in matched
    )
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [((r["lang"], r["source"]), r["n"]) for r in mt] == want

    with pytest.raises(ValueError):
        eng.facet_date_histogram_serial_diff("index merge", meta, "ts", lag=0)
    with pytest.raises(ValueError):
        eng.facet_multi_terms("index merge", corpus, [], k=5)
