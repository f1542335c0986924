"""DSIR importance resampling: hashed n-gram features, target/raw
log-ratio weights, Gumbel-top-N selection. Properties: the feature counts
match a pure-Python reference (same md5 bucketing), weights match the
DuckDB twin exactly, selection is seed-deterministic, prefers
target-looking docs, and degenerates to argmax-N without noise."""

from __future__ import annotations

import hashlib
import math
import os
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import selection as SEL
from searchengine_spark.tokenizer import STOPWORDS, TOKEN_PATTERN

B = 128


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _py_features(text: str, n_buckets: int) -> dict[int, int]:
    toks = [t for t in re.findall(TOKEN_PATTERN, text.lower()) if t not in STOPWORDS]
    grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out: dict[int, int] = {}
    for g in grams:
        h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets
        out[h] = out.get(h, 0) + 1
    return out


def test_features_match_python(spark, docs):
    sample = docs.orderBy("doc_id").limit(20)
    got: dict[int, dict[int, int]] = {}
    for r in SEL.hashed_features(sample, n_buckets=B).collect():
        got.setdefault(r["doc_id"], {})[r["feat"]] = r["cnt"]
    for r in sample.collect():
        want = _py_features(r["text"], B)
        assert got.get(r["doc_id"], {}) == want, r["doc_id"]


def test_weights_match_duckdb(spark, docs, sf_dir):
    w = {r["doc_id"]: round(r["logw"], 5)
         for r in SEL.dsir_weights(docs, "lang = 'en'", n_buckets=B).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    dw = dict(con.execute(
        SEL.dsir_weights_sql("documents", "d.lang = 'en'", n_buckets=B)
    ).fetchall())
    assert len(w) == docs.count() == len(dw)
    for k, v in w.items():
        assert v == pytest.approx(dw[k], abs=1e-9), k


def test_select_deterministic_and_target_biased(spark, docs):
    n = 60
    a = [r["doc_id"] for r in
         SEL.dsir_select(docs, "lang = 'en'", n, seed=3, n_buckets=B).collect()]
    b = [r["doc_id"] for r in
         SEL.dsir_select(docs, "lang = 'en'", n, seed=3, n_buckets=B).collect()]
    assert a == b and len(a) == n
    c = [r["doc_id"] for r in
         SEL.dsir_select(docs, "lang = 'en'", n, seed=4, n_buckets=B).collect()]
    assert a != c  # different seed, different draw
    # the sampled set must skew toward the target distribution
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    frac_sel = sum(langs[d] == "en" for d in a) / n
    frac_all = sum(v == "en" for v in langs.values()) / len(langs)
    assert frac_sel > frac_all


def test_no_gumbel_is_argmax(spark, docs):
    top = SEL.dsir_select(docs, "lang = 'en'", 10, gumbel=False, n_buckets=B).collect()
    w = SEL.dsir_weights(docs, "lang = 'en'", n_buckets=B).collect()
    want = sorted(w, key=lambda r: (-round(r["logw"], 5), r["doc_id"]))[:10]
    assert [r["doc_id"] for r in top] == [r["doc_id"] for r in want]
    # without noise, key is just logw / T
    for r in top:
        assert r["key"] == pytest.approx(r["logw"], abs=1e-4)


def test_temperature_flattens(spark, docs):
    hot = SEL.dsir_select(docs, "lang = 'en'", 10, seed=1, temperature=100.0,
                          n_buckets=B).collect()
    # at T→∞ the weights vanish and the draw is ~uniform noise-only;
    # keys must then be dominated by the Gumbel term (bounded logw/T)
    for r in hot:
        assert abs(r["key"]) < 20
    with pytest.raises(ValueError):
        SEL.dsir_select(docs, "lang = 'en'", 5, temperature=0.0)
