"""BM25F fielded retrieval as pure column arithmetic.

Scores documents that carry SEVERAL text fields (e.g. name + type, title +
body) with per-field weights under ONE saturation, the Robertson/Zaragoza
BM25F ("Simple BM25 extension to multiple weighted fields", CIKM'04):

    tf~_{t,d,f} = tf_{t,d,f} / (1 + b·(len_{d,f}/avgl_f − 1))   field norm
    wtf_{t,d}   = Σ_f w_f · tf~_{t,d,f}                          weighted tf
    score(d)    = Σ_t idf(t) · (k1+1)·wtf / (k1 + wtf)

with idf = ln(1 + (N − df + 0.5)/(df + 0.5)) over DOCUMENT-level df (the
term occurs in any field). The (k1+1) numerator makes the single-field
weight-1.0 case reduce EXACTLY to standard BM25 (tested), so BM25F is a
strict generalization of the engine's primary scorer.

Design notes (100 TB):
  * everything is one declarative plan — per-field explode/agg with map-side
    combine, the |q|-row query side broadcast, field averages a
    |fields|-row broadcast; no Python in the hot path.
  * ``avgl_f`` divides the field-length SUM by the TOTAL corpus doc count
    (docs where the field parses empty count as length 0) — the standard
    convention, and the one the SQL twin mirrors.
  * the per-field tf subtree is referenced twice (lengths need all terms,
    scoring only the query's); Catalyst pushes the term filter below the
    aggregation on the scoring branch, and at real scale the staged-tf
    persist the index build already does (index/build.py stage A) applies
    the same way.

Reference analogue: none — the reference scores a single text field
(``Part C/ranker.py``); fielded weighting is engine-hardening surface a
source-code corpus needs (filename vs file body, SURVEY.md input table).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .postings import term_frequencies
from .scoring import _ordered_sum, _query_df


def fielded_term_frequencies(
    df: DataFrame, id_col: str, fields: list[str]
) -> DataFrame:
    """corpus → (doc_id, field, term, tf): one tokenize+agg per field,
    unioned with a field tag. Each field uses the engine's tokenizer
    (stopword-filtered), so fielded and plain retrieval agree on terms."""
    parts = [
        term_frequencies(df, id_col=id_col, text_col=f_name).withColumn(
            "field", F.lit(f_name)
        )
        for f_name in fields
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("doc_id", "field", "term", "tf")


def bm25f_score(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    fields: dict[str, float],
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """→ (doc_id, score) unsorted, one row per doc matching ≥1 query term
    in ≥1 field. ``fields``: {column_name: weight}. Scores accumulate in
    sorted-term order (bit-stable across parallelism, same discipline as
    ``scoring.bm25_score``)."""
    if not fields:
        raise ValueError("fields must map ≥1 text column to a weight")
    ftf = fielded_term_frequencies(df, id_col, sorted(fields))

    n_corpus = df.select(F.count(F.lit(1)).alias("n"))  # 1 row, broadcast
    flen = ftf.groupBy("doc_id", "field").agg(F.sum("tf").alias("flen"))
    avgf = (
        flen.groupBy("field")
        .agg(F.sum("flen").alias("len_sum"))
        .crossJoin(F.broadcast(n_corpus))
        .select("field", (F.col("len_sum") / F.col("n")).alias("avgfl"))
    )

    q = F.broadcast(_query_df(spark, query).select("term"))
    qtf = ftf.join(q, "term")
    dictf = (
        qtf.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    w_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(fields.items())]
    )
    tf_norm = F.col("tf") / (1.0 + b * (F.col("flen") / F.col("avgfl") - 1.0))
    wtf = (
        qtf.join(flen, ["doc_id", "field"])
        .join(F.broadcast(avgf), "field")
        .select("doc_id", "term", (w_map[F.col("field")] * tf_norm).alias("wt"))
        .groupBy("doc_id", "term")
        .agg(F.sum("wt").alias("wtf"))
    )

    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    cand = wtf.join(F.broadcast(dictf), "term").crossJoin(F.broadcast(n_corpus))
    per_term = idf * (k1 + 1.0) * F.col("wtf") / (k1 + F.col("wtf"))
    return _ordered_sum(cand, per_term)
