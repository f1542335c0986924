"""Multinomial Naive Bayes text classification — the trained counterpart
to the heuristic lang-id/quality signals in ops/textstats.py, for
training-data curation (domain/language/quality routing) at corpus scale.

Why NB and not SGD here: training IS aggregation — class priors and
per-(class, term) counts are two map-side-combined hash aggs over the
token stream, so the "fit" is one distributed pass with no iteration, no
driver-held weights, and an exact DuckDB twin (the judge-checkable
property the other trained components follow). Prediction is a join
against the |vocab|×|classes| model table — broadcast-sized in practice —
plus one (doc, class) sum and an argmax window.

Smoothing: add-α (Laplace) over the TRAIN vocabulary; tokens absent from
a class fall back to log(α / (tokens_c + α·V)); tokens absent from the
train vocabulary entirely are DROPPED (the standard multinomial-NB
convention — they carry no class signal).

All scores rounded before the argmax so the decision is engine-portable
(same per-step pinning as didyoumean's beam).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import tokenize_raw_expr
from .dedup import _TOKS_SQL

ROUND_DP = 5


@dataclass
class NBModel:
    """Distributed model state: two small DataFrames + scalars."""

    class_stats: DataFrame  # (label, n_docs, n_tokens, prior_log)
    token_stats: DataFrame  # (label, term, cnt)
    vocab_size: int
    n_docs: int
    alpha: float


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term"),
    )


def nb_train(
    df: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> NBModel:
    """One distributed pass: class priors + per-(class, term) token counts.
    Both aggs partial-combine map-side; nothing is collected except the
    two scalars (vocab size, doc count)."""
    toks = df.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term"),
    )
    token_stats = toks.groupBy("label", "term").agg(F.count(F.lit(1)).alias("cnt"))
    # class doc counts come from the SOURCE frame: an empty/stopword-only
    # training doc emits no token rows, and counting docs off the token
    # stream would drop it from its class's n_docs while the total
    # denominator still includes it — priors would stop summing to 1 and
    # penalize classes with short/boilerplate members
    doc_counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    class_stats = (
        doc_counts.join(
            toks.groupBy("label").agg(F.count(F.lit(1)).alias("n_tokens")),
            "label",
            "left",
        )
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
    )
    vocab_size = toks.select("term").distinct().count()
    n_docs = df.count()
    class_stats = class_stats.withColumn(
        "prior_log", F.log(F.col("n_docs") / F.lit(float(n_docs)))
    )
    return NBModel(class_stats, token_stats, vocab_size, n_docs, alpha)


def nb_predict(
    model: NBModel,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = ROUND_DP,
) -> DataFrame:
    """(doc_id, pred, score): argmax over classes of
    prior_log + Σ_t tf_t · log((cnt + α)/(n_tokens_c + α·V)), ties on
    label asc. Doc tokens outside the train vocabulary are dropped; a doc
    with NO in-vocabulary tokens (empty text, or fully out-of-vocab)
    still gets a row — the prior argmax, the standard multinomial-NB
    prediction for an empty feature vector — so every input doc_id
    appears exactly once in the output.

    Shape: doc term counts ⋈ train-vocab terms (inner — the drop), cross
    the ≤|classes| class table, LEFT join the model counts (absent →
    smoothed floor), one (doc, label) sum, one argmax window keyed by doc;
    uncovered docs are found with one anti-join and scored from the
    broadcast prior table alone. The model sides are broadcast; the only
    data-sized shuffles are the (doc, label) agg and the anti-join."""
    a = float(model.alpha)
    v = int(model.vocab_size)
    dt = (
        _tokens(df, id_col, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = model.token_stats.select("term").distinct()
    dt = dt.join(F.broadcast(vocab), "term")  # drop out-of-vocab tokens
    cls = model.class_stats.select("label", "n_tokens", "prior_log")
    pairs = dt.crossJoin(F.broadcast(cls))
    scored = pairs.join(
        F.broadcast(model.token_stats), ["label", "term"], "left"
    ).withColumn(
        "lp",
        F.col("tf")
        * F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(a))
            / (F.col("n_tokens") + F.lit(a * v))
        ),
    )
    per_class = (
        scored.groupBy("doc_id", "label", "prior_log")
        .agg(F.sum("lp").alias("ll"))
        .select(
            "doc_id",
            "label",
            F.round(F.col("prior_log") + F.col("ll"), round_dp).alias("score"),
        )
    )
    # docs with zero in-vocab tokens: prior-only rows (empty Σ term)
    uncovered = (
        df.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(dt.select("doc_id").distinct(), "doc_id", "left_anti")
        .crossJoin(
            F.broadcast(
                cls.select(
                    "label", F.round("prior_log", round_dp).alias("score")
                )
            )
        )
    )
    per_class = per_class.unionByName(uncovered)
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    return (
        per_class.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("label").alias("pred"), "score")
    )


def nb_train_predict_sql(
    train_table: str,
    test_table: str,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    round_dp: int = ROUND_DP,
) -> str:
    """DuckDB twin: train on train_table, classify test_table, one query."""
    toks = _TOKS_SQL.format(text=text_col)
    return f"""
WITH tr AS (
  SELECT {label_col} AS label, {id_col} AS doc_id, t.term
  FROM (SELECT {label_col}, {id_col}, {toks} AS ts FROM {train_table}),
       unnest(ts) AS t(term)),
token_stats AS (SELECT label, term, count(*)::BIGINT AS cnt FROM tr GROUP BY 1, 2),
doc_counts AS (
  SELECT {label_col} AS label, count(*)::BIGINT AS n_docs
  FROM {train_table} GROUP BY 1),
class_stats AS (
  SELECT dc.label, dc.n_docs,
         coalesce(tk.n_tokens, 0)::BIGINT AS n_tokens
  FROM doc_counts dc
  LEFT JOIN (SELECT label, count(*)::BIGINT AS n_tokens
             FROM tr GROUP BY 1) tk USING (label)),
consts AS (
  SELECT (SELECT count(DISTINCT term) FROM tr) AS v,
         (SELECT count(*) FROM {train_table}) AS n),
te AS (
  SELECT {id_col} AS doc_id, t.term, count(*)::BIGINT AS tf
  FROM (SELECT {id_col}, {toks} AS ts FROM {test_table}), unnest(ts) AS t(term)
  GROUP BY 1, 2),
te_iv AS (SELECT te.* FROM te SEMI JOIN (SELECT DISTINCT term FROM tr) vt USING (term)),
per_class AS (
  SELECT te_iv.doc_id, cs.label,
         round(ln(cs.n_docs / CAST(c.n AS DOUBLE))
               + sum(te_iv.tf * ln((coalesce(ts.cnt, 0) + {alpha!r})
                                   / (cs.n_tokens + {alpha!r} * c.v))),
               {round_dp}) AS score
  FROM te_iv CROSS JOIN class_stats cs CROSS JOIN consts c
  LEFT JOIN token_stats ts ON ts.label = cs.label AND ts.term = te_iv.term
  GROUP BY te_iv.doc_id, cs.label, cs.n_docs, c.n),
uncovered AS (
  SELECT d.doc_id, cs.label,
         round(ln(cs.n_docs / CAST(c.n AS DOUBLE)), {round_dp}) AS score
  FROM (SELECT DISTINCT {id_col} AS doc_id FROM {test_table}) d
  ANTI JOIN te_iv USING (doc_id)
  CROSS JOIN class_stats cs CROSS JOIN consts c),
all_pc AS (SELECT * FROM per_class UNION ALL SELECT * FROM uncovered),
ranked AS (
  SELECT doc_id, label AS pred, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rn
  FROM all_pc)
SELECT doc_id, pred, score FROM ranked WHERE rn = 1
"""
