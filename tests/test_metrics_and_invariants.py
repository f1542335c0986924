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


def test_ndcg_mrr_toy_values(spark):
    """Hand-computed nDCG@k / MRR on the same toy frame, plus a graded
    query and a no-relevant query (both ES rank_eval edge conventions)."""
    import math

    from searchengine_spark.metrics import mrr, ndcg_at_k, rank_eval

    results = spark.createDataFrame(
        [(1, d, s) for d, s in [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0), (5, 1.0)]]
        + [(2, d, s) for d, s in [(7, 9.0), (8, 8.0)]]
        + [(3, d, s) for d, s in [(11, 2.0)]],
        "query int, doc_id int, score double",
    )
    results = with_rank(results)
    qrels = spark.createDataFrame(
        # q1 binary: relevant 1,3,5 retrieved (+9 unretrieved)
        [(1, 1, 1), (1, 3, 1), (1, 5, 1), (1, 9, 1), (1, 2, 0), (1, 4, 0)]
        # q2 GRADED: doc 8 grade 2 at rank 2, doc 7 grade 1 at rank 1,
        # ideal order would be (8:2, 7:1)
        + [(2, 7, 1), (2, 8, 2)]
        # q3: nothing relevant anywhere
        + [(3, 11, 0)],
        "query int, doc_id int, y_true int",
    )
    nd = {r["query"]: r["ndcg"] for r in ndcg_at_k(results, qrels, 5).collect()}
    # q1: dcg = 1/log2(2) + 1/log2(4) + 1/log2(6); idcg = ranks 1..4 ideal
    dcg1 = 1 / math.log2(2) + 1 / math.log2(4) + 1 / math.log2(6)
    idcg1 = sum(1 / math.log2(i + 1) for i in range(1, 5))
    assert abs(nd[1] - dcg1 / idcg1) < 1e-12
    # q2: dcg = (2^1-1)/log2(2) + (2^2-1)/log2(3); ideal = 3/log2(2)+1/log2(3)
    dcg2 = 1 / math.log2(2) + 3 / math.log2(3)
    idcg2 = 3 / math.log2(2) + 1 / math.log2(3)
    assert abs(nd[2] - dcg2 / idcg2) < 1e-12
    assert nd[3] == 0.0  # no relevant docs → 0 by convention
    rr = {r["query"]: r["rr"] for r in mrr(results, qrels).collect()}
    assert abs(rr[1] - 1.0) < 1e-12  # first relevant at rank 1
    assert abs(rr[2] - 1.0) < 1e-12
    assert rr[3] == 0.0
    panel = {r["query"]: r for r in rank_eval(results, qrels, 5).collect()}
    assert set(panel) == {1, 2, 3}
    assert abs(panel[1]["p_at_k"] - 3 / 5) < 1e-12
    assert abs(panel[1]["ndcg"] - dcg1 / idcg1) < 1e-12
    assert panel[3]["ap"] == 0.0 and panel[3]["recall"] == 0.0


def test_ndcg_idcg_cut_below_relevant_count(spark):
    """IDCG depth is min(k, n_rel): with 3 relevant docs and k=2 the ideal
    page holds only 2 — a metric normalizing against all 3 under-reports."""
    import math

    from searchengine_spark.metrics import ndcg_at_k

    results = with_rank(
        spark.createDataFrame(
            [(1, 1, 5.0), (1, 2, 4.0)], "query int, doc_id int, score double"
        )
    )
    qrels = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 1), (1, 3, 1)], "query int, doc_id int, y_true int"
    )
    nd = ndcg_at_k(results, qrels, 2).collect()[0]["ndcg"]
    ideal2 = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(nd - 1.0) < 1e-12  # perfect page of 2 == its own ideal
    assert abs((1 / math.log2(2) + 1 / math.log2(3)) - ideal2) < 1e-12


def test_corpus_generator_deterministic(spark):
    a = generate_rows(20, seed=42)
    b = generate_rows(20, seed=42)
    assert a == b
    langs = {r[3] for r in a}
    assert langs == {"python", "java", "js", "go", "c"}
