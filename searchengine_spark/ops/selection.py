"""DSIR-style data selection: importance resampling on hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — the public method; no reference-repo counterpart,
this is part of the training-data-pipeline surface).

Pipeline, all relational:

1. ``hashed_features``   — word unigram + adjacent-bigram counts hashed
                           into ``n_buckets`` (md5-derived, reproducible in
                           the SQL oracle). One narrow generate + one hash
                           aggregation; grams never leave the executor
                           unhased, so shuffle rows carry an int64 key
                           instead of strings.
2. ``dsir_logratio``     — fit two smoothed bag-of-features unigram models,
                           target (rows matching a predicate) vs raw (all
                           rows), and emit per-feature
                           λ_f = ln p̂_t(f) − ln p̂_r(f). B rows — tiny,
                           broadcastable at any corpus size.
3. ``dsir_weights``      — per-doc log importance weight
                           log w(d) = Σ_f c_f(d)·λ_f via a broadcast join
                           of the λ table onto the feature stream + one
                           hash aggregation. Featureless docs get logw 0.
4. ``dsir_select``       — sample N docs WITHOUT replacement ∝ softmax of
                           the log-weights via the Gumbel-top-N trick:
                           key = logw + Gumbel(doc_id, seed), deterministic
                           (the noise is an md5 hash, so runs and oracles
                           agree exactly). ``temperature`` flattens or
                           sharpens; ``gumbel=False`` degenerates to
                           deterministic top-N by weight.

Scale: the only wide ops are the two hash aggregations (feature counts,
per-doc weight sums) — both partial-aggregate map-side. The λ model and
the two scalar totals are the sole driver round-trips, each ≤ B rows.
Selection is orderBy+limit → TakeOrderedAndProject (per-partition heaps).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import STOPWORDS, TOKEN_PATTERN, tokenize_raw_expr

ROUND_DP = 5
_H60 = float(1 << 60)  # 15 hex chars → 60-bit uniform hash


def _bucket(col, n_buckets: int):
    """md5-derived feature bucket in [0, n_buckets) — DuckDB-reproducible."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """(doc_id, feat, cnt): hashed unigram + adjacent-bigram counts over
    the stopword-filtered token stream (duplicates preserved — these are
    COUNTS, not presence bits)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize_raw_expr(F.col(text_col)).alias("_toks"),
    )
    uni = toks.select("doc_id", F.explode("_toks").alias("gram"))
    bi = toks.filter(F.size("_toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(_toks, 1, size(_toks) - 1),"
                "         slice(_toks, 2, size(_toks) - 1),"
                "         (dga, dgb) -> concat(dga, ' ', dgb))"
            )
        ).alias("gram"),
    )
    return (
        uni.unionAll(bi)
        .select("doc_id", _bucket(F.col("gram"), n_buckets).alias("feat"))
        .groupBy("doc_id", "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_logratio(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    alpha: float = 1.0,
    features: DataFrame | None = None,
) -> DataFrame:
    """(feat, lam): add-α smoothed log-likelihood ratio of the hashed
    bag-of-features model fit on target rows vs ALL rows. ``target_pred``
    is a Column or SQL-string predicate over ``df``'s columns.
    ``features`` lets a caller share one (persisted) feature stream
    between the model fit and the weight pass — at corpus scale the
    tokenize+hash scan is the dominant cost and must not run twice."""
    pred = F.expr(target_pred) if isinstance(target_pred, str) else target_pred
    feats = (
        features
        if features is not None
        else hashed_features(df, id_col, text_col, n_buckets)
    )
    flags = df.select(F.col(id_col).alias("doc_id"), pred.alias("_t"))
    j = feats.join(flags, "doc_id")
    per_feat = j.groupBy("feat").agg(
        F.sum(F.when(F.col("_t"), F.col("cnt")).otherwise(F.lit(0))).alias("ct"),
        F.sum("cnt").alias("cr"),
    )
    tot = per_feat.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    ).collect()[0]
    tt, tr = float(tot["tt"] or 0), float(tot["tr"] or 0)
    denom_t = F.lit(tt + alpha * n_buckets)
    denom_r = F.lit(tr + alpha * n_buckets)
    lam = F.log((F.col("ct") + F.lit(alpha)) / denom_t) - F.log(
        (F.col("cr") + F.lit(alpha)) / denom_r
    )
    return per_feat.select("feat", lam.alias("lam"))


def dsir_weights(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """(doc_id, logw): per-document log importance weight — the feature
    stream joined (broadcast: λ is ≤ n_buckets rows) with the log-ratio
    model, summed per doc. Docs with no features keep logw = 0.

    The feature stream is computed ONCE and persisted across the model
    fit and the weight pass (two downstream aggregations over the same
    tokenize+hash scan — without the persist the corpus would be read and
    tokenized twice)."""
    feats = hashed_features(df, id_col, text_col, n_buckets).persist()
    # NOTE: the persist is released lazily by Spark's LRU; dsir_logratio's
    # totals collect() materializes it, so the weight pass below reuses the
    # cached stream instead of re-tokenizing the corpus.
    lam = dsir_logratio(
        df, target_pred, id_col, text_col, n_buckets, alpha, features=feats
    )
    w = feats.join(F.broadcast(lam), "feat").groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("lam")).alias("logw")
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(w, "doc_id", "left").select(
        "doc_id", F.coalesce("logw", F.lit(0.0)).alias("logw")
    )


def _gumbel(doc_id_col, seed: int):
    """Deterministic Gumbel(0,1) noise keyed on (doc_id, seed): an md5
    hash → uniform in (0,1) → −ln(−ln u). Hash-derived, so Spark and the
    SQL oracle draw the SAME noise."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(doc_id_col.cast("string"), F.lit(f"#dsir{seed}"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").cast("double")
        + F.lit(0.5)
    ) / F.lit(_H60)
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    target_pred,
    n: int,
    seed: int = 0,
    temperature: float = 1.0,
    gumbel: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """Select ``n`` docs: Gumbel-top-N over logw/temperature — an exact
    sample WITHOUT replacement proportional to softmax(logw/T), fully
    deterministic given ``seed``. ``gumbel=False`` takes the argmax-N
    instead. Returns DataFrame[doc_id, logw, key] (key = ranking score)."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    w = dsir_weights(df, target_pred, id_col, text_col, n_buckets, alpha)
    key = F.col("logw") / F.lit(float(temperature))
    if gumbel:
        key = key + _gumbel(F.col("doc_id"), seed)
    return (
        w.select(
            "doc_id",
            F.round("logw", ROUND_DP).alias("logw"),
            F.round(key, ROUND_DP).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(n)
    )


# ------------------------------------------------------------- SQL twins

def _features_cte(table: str, id_col: str, text_col: str, n_buckets: int) -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
tok_lists AS (
  SELECT {id_col} AS doc_id,
         [t FOR t IN regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')
          IF t NOT IN ({stop_list})] AS l
  FROM {table}),
grams AS (
  SELECT doc_id, unnest(l) AS gram FROM tok_lists
  UNION ALL
  SELECT doc_id, unnest(list_transform(range(1, len(l)),
                                       dsg -> l[dsg] || ' ' || l[dsg + 1])) AS gram
  FROM tok_lists WHERE len(l) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT % {n_buckets} AS feat,
         count(*)::BIGINT AS cnt
  FROM grams GROUP BY 1, 2)"""


def _logratio_cte(
    table: str, id_col: str, target_where: str, n_buckets: int, alpha: float
) -> str:
    return f"""
flagged AS (
  SELECT f.doc_id, f.feat, f.cnt, ({target_where}) AS t
  FROM feats f JOIN {table} d ON f.doc_id = d.{id_col}),
per_feat AS (
  SELECT feat,
         sum(CASE WHEN t THEN cnt ELSE 0 END)::DOUBLE AS ct,
         sum(cnt)::DOUBLE AS cr
  FROM flagged GROUP BY 1),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM per_feat),
lam AS (
  SELECT feat,
         ln((ct + {alpha}) / (tt + {alpha} * {n_buckets}))
           - ln((cr + {alpha}) / (tr + {alpha} * {n_buckets})) AS lam
  FROM per_feat, tot)"""


def dsir_weights_sql(
    table: str,
    target_where: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> str:
    """(doc_id, logw) twin — logw rounded at ROUND_DP for hashing."""
    return f"""
WITH {_features_cte(table, id_col, text_col, n_buckets)},
{_logratio_cte(table, id_col, target_where, n_buckets, alpha).lstrip()},
w AS (
  SELECT f.doc_id, sum(f.cnt * lam.lam) AS logw
  FROM feats f JOIN lam USING (feat) GROUP BY 1)
SELECT d.{id_col} AS doc_id,
       round(coalesce(w.logw, 0.0), {ROUND_DP}) AS logw
FROM {table} d LEFT JOIN w ON d.{id_col} = w.doc_id
"""


def dsir_select_sql(
    table: str,
    target_where: str,
    n: int,
    seed: int = 0,
    temperature: float = 1.0,
    gumbel: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> str:
    noise = (
        f" + (-ln(-ln((('0x' || substr(md5(d.{id_col}::VARCHAR || '#dsir{seed}'), 1, 15))::BIGINT"
        f" + 0.5) / {_H60!r})))"
        if gumbel
        else ""
    )
    return f"""
WITH {_features_cte(table, id_col, text_col, n_buckets)},
{_logratio_cte(table, id_col, target_where, n_buckets, alpha).lstrip()},
w AS (
  SELECT f.doc_id, sum(f.cnt * lam.lam) AS logw
  FROM feats f JOIN lam USING (feat) GROUP BY 1)
SELECT d.{id_col} AS doc_id,
       round(coalesce(w.logw, 0.0), {ROUND_DP}) AS logw,
       round(coalesce(w.logw, 0.0) / {float(temperature)!r}{noise},
             {ROUND_DP}) AS key
FROM {table} d LEFT JOIN w ON d.{id_col} = w.doc_id
ORDER BY key DESC, doc_id ASC
LIMIT {n}
"""
