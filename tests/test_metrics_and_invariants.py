from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from searchengine_spark.corpus import corpus_df, generate_rows
from searchengine_spark.metrics import (
    average_precision,
    mean_average_precision,
    precision_at_k,
    recall,
    with_rank,
)


def test_content_sha_invariant(spark):
    """input_hint: per-row sha256(content) equality vs a trusted local hash."""
    df = corpus_df(spark, 50, seed=5)
    rows = df.select("content", "content_sha").collect()
    assert len(rows) == 50
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha"]


def test_sha_preserved_through_pipeline(spark):
    """Tokenization must not mutate source rows: re-derived sha matches."""
    df = corpus_df(spark, 30, seed=9)
    from searchengine_spark.tokenizer import tokenize_raw_expr

    out = df.withColumn("toks", tokenize_raw_expr(F.col("content")))
    bad = out.filter(F.sha2("content", 256) != F.col("content_sha")).count()
    assert bad == 0


def test_metrics_toy_values(spark):
    """Toy 5-doc example in the spirit of Part A/metrics.py:165-171 asserts."""
    # query 1: retrieved ranks 1..5, relevant = docs 1,3,5 (+doc 9 unretrieved)
    results = spark.createDataFrame(
        [(1, d, s) for d, s in [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0), (5, 1.0)]],
        "query int, doc_id int, score double",
    )
    results = with_rank(results)
    qrels = spark.createDataFrame(
        [(1, 1, 1), (1, 3, 1), (1, 5, 1), (1, 9, 1), (1, 2, 0), (1, 4, 0)],
        "query int, doc_id int, y_true int",
    )
    p5 = precision_at_k(results, qrels, 5).collect()[0]["p_at_k"]
    assert abs(p5 - 3 / 5) < 1e-12
    rec = recall(results, qrels).collect()[0]["recall"]
    assert abs(rec - 3 / 4) < 1e-12
    ap = average_precision(results, qrels).collect()[0]["ap"]
    # relevant at ranks 1,3,5 → precisions 1/1, 2/3, 3/5; /4 relevant total
    assert abs(ap - (1.0 + 2 / 3 + 3 / 5) / 4) < 1e-12
    m = mean_average_precision(results, qrels)
    assert abs(m - ap) < 1e-12


def test_corpus_generator_deterministic(spark):
    a = generate_rows(20, seed=42)
    b = generate_rows(20, seed=42)
    assert a == b
    langs = {r[3] for r in a}
    assert langs == {"python", "java", "js", "go", "c"}
