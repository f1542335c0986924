"""Learning-to-rank surface: per-(query, doc) feature extraction, a
closed-form distributed ridge trainer, and linear scoring.

Parity: the Elasticsearch LTR plugin's feature-logging shape (``sltr``
query + feature sets) re-expressed relationally. The reference has no LTR
surface — its scorers are fixed hand-tuned blends (``Part C/searcher.py``
0.9/0.1, ``Part A/searcher.py`` 0.6/0.4); this module is the modern
replacement for those hand-picked weights: extract features once, fit the
blend on labeled data, score with the learned weights.

Scale shape (100 TB):

* feature extraction is the SAME single broadcast-join + one-shuffle
  aggregation as ``bm25_score_batch`` — the query batch and its
  dictionary slice broadcast (|batch|·|q| rows), the postings scan is
  filtered by the broadcast join before the doc-stats join, every
  feature is an algebraic aggregate with map-side partials;
* training never collects candidates: the normal-equation moments
  (XᵀX, Xᵀy — k≈7 features → ~45 scalar sums) accumulate in ONE
  map-side-combined aggregation and the (k+1)×(k+1) solve happens on the
  driver with numpy. No iteration, no gradient passes, no driver loop.

Float determinism: the two float per-term folds (bm25, idf_sum) use the
sorted-struct ordered accumulation from ``scoring._ordered_sum`` so scores
are bit-stable across parallelism levels; integer features are order-free.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scoring import BM25_B, BM25_K1, bm25_idf_col, parse_query

#: default feature order for the trainer / scorer (all produced by
#: ``ltr_features``; ``matched`` and ``tf_sum`` are integral but enter the
#: model as doubles)
FEATURES = [
    "bm25", "idf_sum", "tf_sum", "matched", "coverage", "doc_len_norm",
    "log_tf",
]


def ltr_features(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    queries: dict[str, str],
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_dp: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, bm25, idf_sum, tf_sum, matched, coverage,
    doc_len_norm, log_tf) for every OR-candidate of every query in the
    batch — the LTR feature-logging pass.

    Features (per query q, doc d, over the matched distinct terms M):
      * ``bm25``          Σ_M idf·tf(k1+1)/(tf + k1(1−b+b·dl/avgdl))
      * ``idf_sum``       Σ_M idf (query-side rarity mass that matched)
      * ``tf_sum``        Σ_M tf (long)
      * ``matched``       |M| (long)
      * ``coverage``      |M| / |distinct query terms|
      * ``doc_len_norm``  dl / avgdl
      * ``log_tf``        ln(1 + tf_sum / dl)

    With ``round_dp`` the float features round for engine-portable
    comparisons (the driver oracle); leave None for training."""
    rows = [
        (qid, t, len(parse_query(q)))
        for qid, q in sorted(queries.items())
        for t, _ in parse_query(q)
    ]
    if not rows:
        raise ValueError("empty query batch")
    dead = sorted(set(queries) - {qid for qid, _, _ in rows})
    if dead:
        # same contract as scoring.bm25_score_batch: a stopword-only query
        # would silently vanish from the feature log — name it instead
        raise ValueError(f"queries tokenized to nothing: {dead}")
    qdf = spark.createDataFrame(rows, "query_id string, term string, qlen int")
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(
        stats_df.select("doc_id", "doc_len"), "doc_id"
    )
    idf = bm25_idf_col(n_docs)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    s_bm25 = idf * (F.col("tf") * (k1 + 1.0)) / denom

    per = cand.select(
        "query_id",
        "doc_id",
        F.struct("term", s_bm25.alias("sb"), idf.alias("si")).alias("ts"),
        "tf",
        "doc_len",
        "qlen",
    )
    agg = per.groupBy("query_id", "doc_id").agg(
        F.sort_array(F.collect_list("ts")).alias("terms"),
        F.sum("tf").cast("long").alias("tf_sum"),
        F.count(F.lit(1)).cast("long").alias("matched"),
        F.first("doc_len").alias("doc_len"),
        F.first("qlen").alias("qlen"),
    )
    fold = lambda field: F.aggregate(  # noqa: E731 — ordered float fold
        F.col("terms"), F.lit(0.0), lambda acc, x: acc + x[field]
    )
    out = agg.select(
        "query_id",
        "doc_id",
        fold("sb").alias("bm25"),
        fold("si").alias("idf_sum"),
        "tf_sum",
        "matched",
        (F.col("matched").cast("double") / F.col("qlen")).alias("coverage"),
        (F.col("doc_len") / F.lit(float(avgdl))).alias("doc_len_norm"),
        F.log1p(F.col("tf_sum").cast("double") / F.col("doc_len")).alias(
            "log_tf"
        ),
    )
    if round_dp is not None:
        out = out.select(
            "query_id", "doc_id",
            *[
                F.round(c, round_dp).alias(c)
                if c not in ("tf_sum", "matched")
                else F.col(c)
                for c in FEATURES
            ],
        )
    return out


def ltr_training_set(
    features: DataFrame,
    qrels: DataFrame,
    label_col: str = "label",
) -> DataFrame:
    """Features ⋈ graded labels: qrels (query_id, doc_id, ``label_col``)
    joined onto the candidates; unlabeled candidates get label 0.0 (the
    standard implicit-negative convention — every retrieved-but-unjudged
    doc is a negative). qrels is tiny relative to candidates → broadcast."""
    # duplicate judgments for one (query, doc) — merged assessor files —
    # would fan out feature rows and double-count the doc in the trainer's
    # moment sums: keep the max grade per pair
    lab = F.broadcast(
        qrels.select(
            "query_id", "doc_id", F.col(label_col).cast("double").alias("_y")
        )
        .groupBy("query_id", "doc_id")
        .agg(F.max("_y").alias("_y"))
    )
    return (
        features.join(lab, ["query_id", "doc_id"], "left")
        .withColumn(label_col, F.coalesce(F.col("_y"), F.lit(0.0)))
        .drop("_y")
    )


def ltr_train_linear(
    features: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = "label",
    l2: float = 1e-9,
) -> dict[str, float]:
    """Closed-form ridge regression on the feature table: ONE map-side-
    combined aggregation accumulates the normal-equation moments
    (Σxᵢxⱼ for i≤j, Σxᵢ, Σxᵢy, Σy, n), the driver solves the augmented
    (k+1)×(k+1) system (A + l2·I)w = b with numpy. Returns
    {feature: weight, "_intercept": w0}. Distributed cost: one pass, ~45
    scalar sums for the default 7 features — identical at 10^3 or 10^12
    rows."""
    cols = list(feature_cols or FEATURES)
    k = len(cols)
    x = [F.col(c).cast("double") for c in cols]
    y = F.col(label_col).cast("double")
    exprs = []
    for i in range(k):
        for j in range(i, k):
            exprs.append(F.sum(x[i] * x[j]).alias(f"xx_{i}_{j}"))
    exprs += [F.sum(x[i]).alias(f"sx_{i}") for i in range(k)]
    exprs += [F.sum(x[i] * y).alias(f"xy_{i}") for i in range(k)]
    exprs += [F.sum(y).alias("sy"), F.count(F.lit(1)).alias("n")]
    row = features.agg(*exprs).collect()[0]
    if int(row["n"]) == 0:
        raise ValueError("empty feature table — nothing to fit")

    A = np.zeros((k + 1, k + 1))
    bvec = np.zeros(k + 1)
    for i in range(k):
        for j in range(i, k):
            A[i, j] = A[j, i] = row[f"xx_{i}_{j}"]
        A[i, k] = A[k, i] = row[f"sx_{i}"]
        bvec[i] = row[f"xy_{i}"]
    A[k, k] = float(row["n"])
    bvec[k] = row["sy"]
    A += l2 * np.eye(k + 1)
    w = np.linalg.solve(A, bvec)
    out = {c: float(w[i]) for i, c in enumerate(cols)}
    out["_intercept"] = float(w[k])
    return out


def ltr_score(
    features: DataFrame,
    weights: dict[str, float],
    k: int | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """Linear scoring pass: score = w·x + intercept over the feature
    table — (query_id, doc_id, score[, rank]). With ``k`` a per-query
    window cut yields ranked top-k (ties: score desc, doc_id asc), rank
    decided on the ROUNDED score when ``round_dp`` is set so ranks are
    engine-portable."""
    from pyspark.sql import Window

    expr = F.lit(float(weights.get("_intercept", 0.0)))
    for c, w in sorted(weights.items()):
        if c == "_intercept":
            continue
        expr = expr + F.lit(float(w)) * F.col(c).cast("double")
    if round_dp is not None:
        expr = F.round(expr, round_dp)
    out = features.select("query_id", "doc_id", expr.alias("score"))
    if k is None:
        return out
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
