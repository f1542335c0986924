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


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hll_vals(spark):
    # 3,000 distinct terms, heavy duplication (the sketch must not care)
    return spark.createDataFrame(
        [(f"term_{i % 3000}",) for i in range(20000)], "term string"
    )


def test_hll_registers_match_duckdb(spark, hll_vals):
    import duckdb

    con = duckdb.connect()
    con.register("vals", hll_vals.toPandas())
    for p in (8, 12):
        s = sorted(
            (r["bucket"], r["rho"])
            for r in sketch.hll_build(hll_vals, "term", p=p).collect()
        )
        o = sorted(con.execute(sketch.hll_build_sql("vals", "term", p=p)).fetchall())
        assert s == o


def test_hll_estimate_within_error_bound(spark, hll_vals):
    # standard error ≈ 1.04/sqrt(m); assert within 3σ at p=12 (m=4096)
    est = sketch.hll_estimate(
        sketch.hll_build(hll_vals, "term", p=12), p=12
    ).collect()[0][0]
    assert abs(est - 3000) / 3000 < 3 * 1.04 / (1 << 12) ** 0.5


def test_hll_merge_equals_union_sketch(spark, hll_vals):
    other = spark.createDataFrame(
        [(f"other_{i}",) for i in range(1000)], "term string"
    )
    merged = sketch.hll_merge(
        sketch.hll_build(hll_vals, "term", p=10),
        sketch.hll_build(other, "term", p=10),
    )
    direct = sketch.hll_build(hll_vals.unionByName(other), "term", p=10)
    est_m = sketch.hll_estimate(merged, p=10).collect()[0][0]
    est_d = sketch.hll_estimate(direct, p=10).collect()[0][0]
    assert est_m == est_d  # register-wise max is EXACT union semantics


def test_hll_merge_idempotent_on_overlap(spark, hll_vals):
    # merging a sketch with itself changes nothing (replay safety)
    r = sketch.hll_build(hll_vals, "term", p=10)
    est1 = sketch.hll_estimate(r, p=10).collect()[0][0]
    est2 = sketch.hll_estimate(sketch.hll_merge(r, r), p=10).collect()[0][0]
    assert est1 == est2


def test_hll_estimate_parallelism_independent(spark, hll_vals):
    # integer-exact register sum → same estimate at any partitioning
    r1 = sketch.hll_build(hll_vals.repartition(1), "term", p=12)
    r7 = sketch.hll_build(hll_vals.repartition(7), "term", p=12)
    e1 = sketch.hll_estimate(r1, p=12).collect()[0][0]
    e7 = sketch.hll_estimate(r7, p=12).collect()[0][0]
    assert e1 == e7


def test_hll_p_validation(spark, hll_vals):
    with pytest.raises(ValueError):
        sketch.hll_build(hll_vals, "term", p=2)


def test_stream_hll_folds_to_batch_sketch(spark, tmp_path):
    """Two streamed micro-batches → folded registers == one batch sketch
    over the union; and re-folding a duplicated epoch changes nothing
    (max-merge idempotence through the streaming path)."""
    import shutil

    from pyspark.sql import functions as F

    from searchengine_spark.ops.sketch import hll_build, read_hll, stream_hll
    from searchengine_spark.tokenizer import tokenize_raw_expr

    src = str(tmp_path / "src")
    a = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    b = spark.createDataFrame(DOCS[1:], "doc_id long, text string")
    a.coalesce(1).write.mode("append").parquet(src)
    q = stream_hll(spark, src, str(tmp_path / "sk"), str(tmp_path / "ck"), p=10)
    try:
        q.processAllAvailable()
        b.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    folded = sorted(map(tuple, read_hll(spark, str(tmp_path / "sk")).collect()))
    both = spark.createDataFrame(DOCS, "doc_id long, text string")
    toks = both.select(F.explode(tokenize_raw_expr(F.col("text"))).alias("term"))
    want = sorted(map(tuple, hll_build(toks, "term", p=10).collect()))
    assert folded == want
    # duplicate an epoch dir → idempotent under max-fold
    sk = tmp_path / "sk"
    epochs = [d for d in sk.iterdir() if d.name.startswith("epoch=")]
    shutil.copytree(epochs[0], sk / "epoch=999")
    refolded = sorted(map(tuple, read_hll(spark, str(sk)).collect()))
    assert refolded == want


# --------------------------- heavy hitters ---------------------------------


def _exact_topk(rows, k):
    from collections import Counter

    c = Counter()
    for item, n in rows:
        c[item] += n
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(item, cnt, i + 1) for i, (item, cnt) in enumerate(ranked)]


def test_heavy_hitters_certified_on_skew(spark):
    """Zipf-ish data with small m: the heads dominate every batch summary,
    E stays below the k-th count, and the CERTIFIED output equals exact
    top-k (no fallback scan)."""
    rows = [(f"h{i}", 1) for i in range(5) for _ in range(400 - 40 * i)]
    rows += [(f"t{i}", 1) for i in range(60)]  # singleton tail
    df = spark.createDataFrame(rows, "item string, w int").repartition(8)
    out, info = sketch.heavy_hitters(df, "item", k=3, m=8)
    assert info["certified"] and not info["fallback"]
    assert info["e_bound"] < 400
    assert [tuple(r) for r in out.collect()] == _exact_topk(rows, 3)


def test_heavy_hitters_fallback_on_uniform(spark):
    """Uniform data with tiny m: the miss bound E swamps the k-th count,
    certification fails, and the fallback full aggregation still returns
    the exact answer (flagged)."""
    rows = [(f"u{i:03d}", 1) for i in range(300) for _ in range(2)]
    df = spark.createDataFrame(rows, "item string, w int").repartition(4)
    out, info = sketch.heavy_hitters(df, "item", k=5, m=2)
    assert info["fallback"] and info["certified"]
    assert [tuple(r) for r in out.collect()] == _exact_topk(rows, 5)


def test_heavy_hitters_no_fallback_flag(spark):
    rows = [(f"u{i:03d}", 1) for i in range(300) for _ in range(2)]
    df = spark.createDataFrame(rows, "item string, w int").repartition(4)
    out, info = sketch.heavy_hitters(df, "item", k=5, m=2, exact_fallback=False)
    assert not info["certified"] and not info["fallback"]
    # uncertified-but-returned candidates still carry EXACT counts
    exact = dict(
        (i, c) for i, c, _ in _exact_topk(rows, 300)
    )
    for r in out.collect():
        assert exact[r["item"]] == r["cnt"]


def test_heavy_hitters_weighted_equals_exploded(spark):
    """weight_col=w must equal the row-per-occurrence computation."""
    rows = [("a", 5), ("b", 3), ("a", 4), ("c", 9), ("b", 1), ("d", 2)]
    wdf = spark.createDataFrame(rows, "item string, w int")
    exploded = spark.createDataFrame(
        [(i,) for i, n in rows for _ in range(n)], "item string"
    )
    got_w, info_w = sketch.heavy_hitters(wdf, "item", k=4, m=16, weight_col="w")
    got_e, info_e = sketch.heavy_hitters(exploded, "item", k=4, m=16)
    assert info_w["certified"] and info_e["certified"]
    assert [tuple(r) for r in got_w.collect()] == [tuple(r) for r in got_e.collect()]


def test_heavy_hitters_fewer_than_k(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "item string")
    out, info = sketch.heavy_hitters(df, "item", k=10, m=4)
    assert info["certified"]
    assert [tuple(r) for r in out.collect()] == [("a", 2, 1), ("b", 1, 2)]


def test_heavy_hitters_validation(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        sketch.heavy_hitters(df, "item", k=0)
    with pytest.raises(ValueError):
        sketch.heavy_hitters(df, "item", k=1, m=0)
