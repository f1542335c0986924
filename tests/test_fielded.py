"""BM25F fielded retrieval: brute-force oracle on the part table, exact
reduction to standard BM25 in the single-field case, and field-weight
monotonicity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark import BM25_B, BM25_K1
from searchengine_spark.fielded import bm25f_score
from searchengine_spark.tokenizer import tokenize_py

PART = "/root/testdata/sf0.001/part.parquet"
DOCS = "/root/testdata/sf0.001/documents.parquet"
QUERY = "small gear large"
FIELDS = {"p_name": 2.0, "p_type": 1.0}
K1, B = 1.2, 0.75


def _brute_bm25f(rows, fields, query, k1, b):
    """Pure-Python BM25F over collected rows (field norm → weighted tf →
    saturation, document-level df)."""
    terms = sorted(set(tokenize_py(query)))
    n = len(rows)
    tf = {}   # (doc, field, term) -> tf
    flen = {}  # (doc, field) -> len
    for r in rows:
        for f_name in fields:
            toks = tokenize_py(r[f_name])
            flen[(r["p_partkey"], f_name)] = len(toks)
            for t in toks:
                key = (r["p_partkey"], f_name, t)
                tf[key] = tf.get(key, 0) + 1
    avgfl = {
        f_name: sum(flen[(r["p_partkey"], f_name)] for r in rows) / n
        for f_name in fields
    }
    df = {
        t: sum(
            1 for r in rows
            if any(tf.get((r["p_partkey"], f_name, t)) for f_name in fields)
        )
        for t in terms
    }
    out = {}
    for r in rows:
        d = r["p_partkey"]
        score = 0.0
        for t in terms:
            wtf = 0.0
            for f_name, w in fields.items():
                raw = tf.get((d, f_name, t), 0)
                if raw:
                    norm = 1.0 + b * (flen[(d, f_name)] / avgfl[f_name] - 1.0)
                    wtf += w * raw / norm
            if wtf:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                score += idf * (k1 + 1.0) * wtf / (k1 + wtf)
        if score:
            out[d] = score
    return out


@pytest.fixture(scope="module")
def part_rows(spark):
    return spark.read.parquet(PART).collect()


def test_bm25f_matches_brute_force(spark, part_rows):
    want = _brute_bm25f(part_rows, FIELDS, QUERY, K1, B)
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_score(
            spark, spark.read.parquet(PART), "p_partkey", FIELDS, QUERY,
            k1=K1, b=B,
        ).collect()
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-12)


def test_single_field_reduces_to_bm25(spark):
    """BM25F over one field with weight 1.0 IS standard BM25 (the (k1+1)
    numerator makes the algebra exact, not just rank-equal)."""
    from searchengine_spark.postings import (
        corpus_stats, dictionary, doc_stats, term_frequencies,
    )
    from searchengine_spark.scoring import bm25_score

    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 300)
    tf = term_frequencies(docs)
    stats = doc_stats(tf)
    n, avgdl = corpus_stats(stats)
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_score(
            spark, tf, stats, dictionary(tf), "spark join stream", n, avgdl,
            k1=BM25_K1, b=BM25_B,
        ).collect()
    }
    # NOTE: bm25f's N is count(df) rows; docs whose text parses empty are
    # still corpus members in both paths (term_frequencies drops them from
    # tf only), so the scalars agree.
    assert docs.count() == n
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_score(
            spark, docs, "doc_id", {"text": 1.0}, "spark join stream",
            k1=BM25_K1, b=BM25_B,
        ).collect()
    }
    assert set(got) == set(base)
    for d, s in base.items():
        assert got[d] == pytest.approx(s, rel=1e-12)


def test_field_weight_monotonicity(spark, part_rows):
    """Raising the name weight must (weakly) raise every score of docs that
    match in the name field and leave type-only matchers unchanged."""
    pdf = spark.read.parquet(PART)
    lo = {r["doc_id"]: r["score"]
          for r in bm25f_score(spark, pdf, "p_partkey",
                               {"p_name": 1.0, "p_type": 1.0}, QUERY).collect()}
    hi = {r["doc_id"]: r["score"]
          for r in bm25f_score(spark, pdf, "p_partkey",
                               {"p_name": 4.0, "p_type": 1.0}, QUERY).collect()}
    assert set(lo) == set(hi)
    qterms = set(tokenize_py(QUERY))
    for r in part_rows:
        d = r["p_partkey"]
        if d not in lo:
            continue
        name_match = bool(qterms & set(tokenize_py(r["p_name"])))
        if name_match:
            assert hi[d] > lo[d]
        else:
            assert hi[d] == pytest.approx(lo[d], rel=1e-12)


def test_rejects_empty_fields(spark):
    with pytest.raises(ValueError):
        bm25f_score(spark, spark.read.parquet(PART), "p_partkey", {}, QUERY)


# ------------------------------------------ multi_match type=best_fields
def _field_bm25(spark, df, id_col, field, query, k1=1.2, b=0.75):
    """One field scored as an independent BM25 index (field df, field
    avgdl over TOTAL doc count) — the sub-query best_fields combines."""
    from searchengine_spark.postings import term_frequencies
    from searchengine_spark.scoring import bm25_score

    tf = term_frequencies(df, id_col=id_col, text_col=field)
    stats = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    n = df.count()
    avgdl = stats.agg(F.sum("doc_len").alias("s")).first()["s"] / n
    dct = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return {
        r["doc_id"]: r["score"]
        for r in bm25_score(spark, tf, stats, dct, query, n, avgdl, k1, b).collect()
    }


def test_multi_match_single_field_is_plain_bm25(spark):
    from searchengine_spark.fielded import multi_match_best_fields

    pdf = spark.read.parquet(PART)
    base = _field_bm25(spark, pdf, "p_partkey", "p_name", QUERY)
    got = {
        r["doc_id"]: r["score"]
        for r in multi_match_best_fields(
            spark, pdf, "p_partkey", {"p_name": 1.0}, QUERY
        ).collect()
    }
    assert set(got) == set(base)
    for d, s in base.items():
        assert got[d] == pytest.approx(round(s, 5), abs=1e-9)


def test_multi_match_best_fields_semantics(spark):
    """tie=0 → per-doc max of weighted field scores; tie>0 adds the
    tie-weighted rest; membership = union of field matches."""
    from searchengine_spark.fielded import multi_match_best_fields

    pdf = spark.read.parquet(PART)
    name = _field_bm25(spark, pdf, "p_partkey", "p_name", QUERY)
    typ = _field_bm25(spark, pdf, "p_partkey", "p_type", QUERY)
    wname = {d: round(2.0 * s, 5) for d, s in name.items()}
    wtyp = {d: round(1.0 * s, 5) for d, s in typ.items()}
    best = {
        r["doc_id"]: r["score"]
        for r in multi_match_best_fields(
            spark, pdf, "p_partkey", FIELDS, QUERY, tie_breaker=0.0
        ).collect()
    }
    assert set(best) == set(wname) | set(wtyp)
    both = set(wname) & set(wtyp)
    assert both  # fixture sanity: some docs match in both fields
    for d in best:
        want = max(wname.get(d, -1e9), wtyp.get(d, -1e9))
        assert best[d] == pytest.approx(want, abs=2e-5)
    tb = {
        r["doc_id"]: r["score"]
        for r in multi_match_best_fields(
            spark, pdf, "p_partkey", FIELDS, QUERY, tie_breaker=0.4
        ).collect()
    }
    for d in both:
        lo, hi = sorted((wname[d], wtyp[d]))
        assert tb[d] == pytest.approx(hi + 0.4 * lo, abs=2e-5)


# -------------------------------------------------------- combined_fields
def _brute_combined(rows, fields, query, k1, b):
    """Pure-Python combined_fields: ONE synthetic field — weighted tf sum,
    weighted length, single saturation, document-level df."""
    from searchengine_spark.tokenizer import tokenize_py as tok

    terms = sorted(set(tok(query)))
    n = len(rows)
    ctf, clen = {}, {}
    for r in rows:
        d = r["p_partkey"]
        for f_name, w in fields.items():
            toks = tok(r[f_name])
            clen[d] = clen.get(d, 0.0) + w * len(toks)
            for t in toks:
                ctf[(d, t)] = ctf.get((d, t), 0.0) + w
    avgdl = sum(clen.values()) / n
    df = {t: sum(1 for r in rows if (r["p_partkey"], t) in ctf) for t in terms}
    out = {}
    for r in rows:
        d, score = r["p_partkey"], 0.0
        for t in terms:
            c = ctf.get((d, t), 0.0)
            if c:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                score += idf * (k1 + 1.0) * c / (
                    c + k1 * (1.0 - b + b * clen[d] / avgdl)
                )
        if score:
            out[d] = score
    return out


def test_combined_fields_matches_brute_force(spark, part_rows):
    from searchengine_spark.fielded import combined_fields_score

    part = spark.read.parquet(PART)
    got = {
        r["doc_id"]: r["score"]
        for r in combined_fields_score(
            spark, part, "p_partkey", FIELDS, QUERY, k1=K1, b=B
        ).collect()
    }
    want = _brute_combined(part_rows, FIELDS, QUERY, K1, B)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_combined_fields_single_field_reduces_to_bm25(spark):
    """weight-1 single field: tf_c = tf, len_c = doc_len, so the synthetic
    field IS the field — exact BM25 equality, like BM25F's reduction."""
    from searchengine_spark.fielded import combined_fields_score
    from searchengine_spark.postings import (
        corpus_stats, dictionary, doc_stats, term_frequencies,
    )
    from searchengine_spark.scoring import bm25_score

    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 300)
    tf = term_frequencies(docs)
    stats = doc_stats(tf)
    n, avgdl = corpus_stats(stats)
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_score(
            spark, tf, stats, dictionary(tf), "spark join stream", n, avgdl,
            k1=BM25_K1, b=BM25_B,
        ).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in combined_fields_score(
            spark, docs, "doc_id", {"text": 1.0}, "spark join stream",
            k1=BM25_K1, b=BM25_B,
        ).collect()
    }
    assert got == base


def test_combined_fields_diverges_from_bm25f(spark):
    """The two semantics must NOT coincide when field lengths VARY:
    BM25F normalizes per field, combined_fields by the merged length.
    (On the part table they coincide exactly — every p_name is 5 tokens
    and every p_type 3, so all norms collapse to 1; that uniformity is
    why the divergence needs a varied-length corpus.)"""
    from searchengine_spark.fielded import combined_fields_score

    rows = [
        (1, "gear gear gear small", "tin"),
        (2, "gear", "small small gear tin tin tin tin"),
        (3, "small tin", "gear gear"),
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_type string"
    )
    cf = {
        r["doc_id"]: r["score"]
        for r in combined_fields_score(
            spark, df, "p_partkey", FIELDS, "small gear", k1=K1, b=B
        ).collect()
    }
    ff = {
        r["doc_id"]: r["score"]
        for r in bm25f_score(
            spark, df, "p_partkey", FIELDS, "small gear", k1=K1, b=B
        ).collect()
    }
    assert set(cf) == set(ff)  # same match set (same terms, same fields)
    assert any(abs(cf[d] - ff[d]) > 1e-9 for d in cf)
