"""Count-Min sketch (ops/sketch.py): never-underestimate invariant under
forced collisions, exactness at ample width, merge linearity, and the
DuckDB counter-table twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import sketch

DOCS = [
    (1, "alpha alpha alpha beta gamma"),
    (2, "alpha beta delta delta epsilon"),
    (3, "zeta eta theta iota kappa alpha"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _true_counts(docs):
    from searchengine_spark.tokenizer import tokenize_py

    out: dict[str, int] = {}
    for _, text in DOCS:
        for t in tokenize_py(text):
            out[t] = out.get(t, 0) + 1
    return out


def test_never_underestimates_even_with_collisions(spark, docs):
    true = _true_counts(docs)
    # width 4 forces heavy collisions; the min-over-rows estimate must
    # still bound every true count from above
    cms = sketch.cms_build(docs, depth=3, width=4)
    est = {
        r["term"]: r["est"]
        for r in sketch.cms_estimate(cms, list(true), 3, 4).collect()
    }
    for t, c in true.items():
        assert est[t] >= c, (t, est[t], c)


def test_exact_at_ample_width(spark, docs):
    true = _true_counts(docs)
    cms = sketch.cms_build(docs, depth=4, width=4096)
    est = {
        r["term"]: r["est"]
        for r in sketch.cms_estimate(cms, list(true) + ["absent"], 4, 4096).collect()
    }
    assert est.pop("absent") == 0
    assert est == true


def test_merge_linearity(spark):
    """Sketch(A ∪ B) == counter-sum of Sketch(A) and Sketch(B) — the
    property that lets per-epoch/per-corpus sketches fold without
    touching the token stream again."""
    a = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    b = spark.createDataFrame(DOCS[1:], "doc_id long, text string")
    both = spark.createDataFrame(DOCS, "doc_id long, text string")
    merged = (
        sketch.cms_build(a, 3, 64).unionByName(sketch.cms_build(b, 3, 64))
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(merged) == key(sketch.cms_build(both, 3, 64))


def test_duckdb_twin_counter_exact(spark, docs):
    import duckdb

    con = duckdb.connect()
    con.register("t", docs.toPandas())
    got = sorted(map(tuple, sketch.cms_build(docs, 4, 128).collect()))
    want = sorted(map(tuple, con.execute(
        sketch.cms_build_sql("t", 4, 128)).fetchall()))
    assert got == want


def test_stream_cms_folds_to_batch_sketch(spark, tmp_path):
    """Two micro-batches of streamed docs → folded sketch == one batch
    sketch over the union (linearity through the streaming path)."""
    from searchengine_spark.ops.sketch import cms_build, read_cms, stream_cms

    src = str(tmp_path / "src")
    a = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    b = spark.createDataFrame(DOCS[1:], "doc_id long, text string")
    a.coalesce(1).write.mode("append").parquet(src)
    q = stream_cms(spark, src, str(tmp_path / "sk"), str(tmp_path / "ck"),
                   depth=3, width=64)
    try:
        q.processAllAvailable()
        b.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    folded = sorted(
        map(tuple, read_cms(spark, str(tmp_path / "sk")).collect())
    )
    both = spark.createDataFrame(DOCS, "doc_id long, text string")
    want = sorted(map(tuple, cms_build(both, 3, 64).collect()))
    assert folded == want


def test_hist_quantile_bounded_error_and_merge(spark):
    from searchengine_spark.ops.sketch import hist_build, hist_quantile

    import numpy as np

    vals = [float(v) for v in np.linspace(0, 100, 201)]  # 0, 0.5, ..., 100
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    h = hist_build(df, "value", bin_width=2.0)
    for q in (0.1, 0.5, 0.9, 1.0):
        est = hist_quantile(h, q, 2.0)
        true = float(np.quantile(vals, q, method="lower"))
        assert abs(est - true) <= 2.0, (q, est, true)
    # merge = counter sum (same linearity contract as the CMS)
    a = spark.createDataFrame([(v,) for v in vals[:100]], "value double")
    b = spark.createDataFrame([(v,) for v in vals[100:]], "value double")
    from pyspark.sql import functions as FF
    merged = (
        hist_build(a, "value", 2.0).unionByName(hist_build(b, "value", 2.0))
        .groupBy("bin").agg(FF.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, h.collect()))


def test_hist_quantile_validation(spark):
    from searchengine_spark.ops.sketch import hist_build, hist_quantile

    df = spark.createDataFrame([(1.0,)], "value double")
    h = hist_build(df)
    with pytest.raises(ValueError, match="q must"):
        hist_quantile(h, 0.0)
