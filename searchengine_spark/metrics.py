"""IR evaluation metrics as DataFrame ops.

Reference analogue: ``Part A/metrics.py:140-171`` and ``Part C/metrics.py``
(precision, precision@k, recall, average precision, MAP — with golden
expected values used in their asserts) and the harness join
``Part C/test_part_c_students_old.py:151-195`` (J4/A8 in SURVEY.md §2).

Inputs:
  results: (query, doc_id, rank)   rank 1-based (W4: row_number over
           (score desc, doc_id asc))
  qrels:   (query, doc_id, y_true) 0/1 relevance labels

All joins are broadcast-friendly (qrels are tiny relative to the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_rank(scored: DataFrame) -> DataFrame:
    """(query, doc_id, score) → + rank (deterministic tie-break)."""
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w))


def _labeled(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """left join: unlabeled retrieved docs count as non-relevant (y_true=0),
    matching the reference's inner-join + fillna hygiene."""
    return results.join(
        F.broadcast(qrels), ["query", "doc_id"], "left"
    ).withColumn("y_true", F.coalesce(F.col("y_true"), F.lit(0)))


def precision_at_k(results: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """(query, p_at_k): fraction of top-k retrieved that are relevant
    (denominator k, as in ``Part A/metrics.py`` precision)."""
    lab = _labeled(results.filter(F.col("rank") <= k), qrels)
    return lab.groupBy("query").agg(
        (F.sum("y_true") / F.lit(float(k))).alias("p_at_k")
    )


def recall(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query, recall): retrieved relevant / all relevant (A8 rollup)."""
    total = qrels.filter(F.col("y_true") == 1).groupBy("query").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    got = _labeled(results, qrels).groupBy("query").agg(F.sum("y_true").alias("n_hit"))
    return got.join(total, "query").select(
        "query", (F.col("n_hit") / F.col("n_rel")).alias("recall")
    )


def average_precision(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query, ap): mean over relevant retrieved docs of precision@rank."""
    lab = _labeled(results, qrels)
    w = Window.partitionBy("query").orderBy("rank")
    prec_at_rank = F.sum("y_true").over(w) / F.col("rank")
    per = lab.withColumn("p_r", prec_at_rank)
    n_rel = qrels.filter(F.col("y_true") == 1).groupBy("query").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    return (
        per.filter(F.col("y_true") == 1)
        .groupBy("query")
        .agg(F.sum("p_r").alias("sum_p"))
        .join(n_rel, "query")
        .select("query", (F.col("sum_p") / F.col("n_rel")).alias("ap"))
    )


def mean_average_precision(results: DataFrame, qrels: DataFrame) -> float:
    ap = average_precision(results, qrels)
    row = ap.agg(F.avg("ap").alias("map")).collect()[0]
    return float(row["map"]) if row["map"] is not None else 0.0
