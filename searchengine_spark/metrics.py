"""IR evaluation metrics as DataFrame ops.

Reference analogue: ``Part A/metrics.py:140-171`` and ``Part C/metrics.py``
(precision, precision@k, recall, average precision, MAP — with golden
expected values used in their asserts) and the harness join
``Part C/test_part_c_students_old.py:151-195`` (J4/A8 in SURVEY.md §2).

Inputs:
  results: (query, doc_id, rank)   rank 1-based (W4: row_number over
           (score desc, doc_id asc))
  qrels:   (query, doc_id, y_true) relevance labels — the binary metrics
           treat y_true > 0 as relevant (graded labels binarize, the same
           rule ndcg/mrr already use; summing raw grades would let recall
           exceed 1.0)

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
    rel = (F.col("y_true") > 0).cast("int")  # graded labels binarize —
    # summing raw grades would disagree with ndcg/mrr's y_true > 0 rule
    return lab.groupBy("query").agg(
        (F.sum(rel) / F.lit(float(k))).alias("p_at_k")
    )


def recall(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query, recall): retrieved relevant / all relevant (A8 rollup)."""
    total = qrels.filter(F.col("y_true") > 0).groupBy("query").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    got = _labeled(results, qrels).groupBy("query").agg(
        F.sum((F.col("y_true") > 0).cast("int")).alias("n_hit")
    )
    return got.join(total, "query").select(
        "query", (F.col("n_hit") / F.col("n_rel")).alias("recall")
    )


def average_precision(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query, ap): mean over relevant retrieved docs of precision@rank."""
    lab = _labeled(results, qrels).withColumn(
        "y_rel", (F.col("y_true") > 0).cast("int")
    )
    w = Window.partitionBy("query").orderBy("rank")
    prec_at_rank = F.sum("y_rel").over(w) / F.col("rank")
    per = lab.withColumn("p_r", prec_at_rank)
    n_rel = qrels.filter(F.col("y_true") > 0).groupBy("query").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    return (
        per.filter(F.col("y_rel") == 1)
        .groupBy("query")
        .agg(F.sum("p_r").alias("sum_p"))
        .join(n_rel, "query")
        .select("query", (F.col("sum_p") / F.col("n_rel")).alias("ap"))
    )


def mean_average_precision(results: DataFrame, qrels: DataFrame) -> float:
    ap = average_precision(results, qrels)
    row = ap.agg(F.avg("ap").alias("map")).collect()[0]
    return float(row["map"]) if row["map"] is not None else 0.0


def ndcg_at_k(results: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """(query, ndcg): normalized discounted cumulative gain at cut k with
    the standard exponential gain (2^rel − 1)/log2(rank+1) — the ES
    ``rank_eval`` / trec_eval formulation. ``y_true`` may be GRADED (any
    non-negative integer); binary labels reduce to 1/log2(rank+1).

    IDCG ranks the query's labeled relevant docs by grade descending and
    cuts at k — a query whose relevant set is larger than k normalizes
    against the best achievable PAGE, not the whole set (standard nDCG@k).
    Queries with no relevant docs get ndcg = 0.0 (ES convention)."""
    lab = _labeled(results.filter(F.col("rank") <= k), qrels)
    gain = (F.pow(F.lit(2.0), F.col("y_true")) - 1.0) / F.log2(F.col("rank") + 1.0)
    dcg = lab.groupBy("query").agg(F.sum(gain).alias("dcg"))
    iw = Window.partitionBy("query").orderBy(F.desc("y_true"), F.asc("doc_id"))
    ideal = (
        qrels.filter(F.col("y_true") > 0)
        .withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .withColumn(
            "igain",
            (F.pow(F.lit(2.0), F.col("y_true")) - 1.0) / F.log2(F.col("irank") + 1.0),
        )
        .groupBy("query")
        .agg(F.sum("igain").alias("idcg"))
    )
    return (
        results.select("query").distinct()
        .join(dcg, "query", "left")
        .join(F.broadcast(ideal), "query", "left")
        .select(
            "query",
            F.when(
                F.col("idcg").isNotNull() & (F.col("idcg") > 0),
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def mrr(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query, rr): reciprocal rank of the FIRST relevant retrieved doc
    (0.0 when no relevant doc was retrieved) — mean over queries is MRR,
    the ES ``mean_reciprocal_rank`` rank_eval metric."""
    first = (
        _labeled(results, qrels)
        .filter(F.col("y_true") > 0)
        .groupBy("query")
        .agg((1.0 / F.min("rank")).alias("rr"))
    )
    return (
        results.select("query").distinct()
        .join(first, "query", "left")
        .select("query", F.coalesce(F.col("rr"), F.lit(0.0)).alias("rr"))
    )


def rank_eval(results: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Per-query metric panel — the ES ``_rank_eval`` API shape: one row per
    query with (p_at_k, recall, ap, ndcg, rr). The five metrics each
    consume the ranked results/labels frames, so both are PERSISTED for
    the panel's duration — without that every metric re-scans the results
    lineage (5+ scans of a potentially expensive ranked frame). Queries
    whose metric is undefined (no relevant docs / none retrieved) report
    0.0 so the panel is total over the query set. Frames the CALLER already
    persisted are left alone (and left cached on return) — only caches this
    function created are released."""
    own_results = not results.is_cached
    own_qrels = not qrels.is_cached
    if own_results:
        results = results.persist()
    if own_qrels:
        qrels = qrels.persist()
    base = results.select("query").distinct()
    out = (
        base.join(precision_at_k(results, qrels, k), "query", "left")
        .join(recall(results, qrels), "query", "left")
        .join(average_precision(results, qrels), "query", "left")
        .join(ndcg_at_k(results, qrels, k), "query", "left")
        .join(mrr(results, qrels), "query", "left")
    )
    for c in ("p_at_k", "recall", "ap", "ndcg", "rr"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    out = out.localCheckpoint()  # materialize, then release the inputs
    if own_results:
        results.unpersist()
    if own_qrels:
        qrels.unpersist()
    return out
