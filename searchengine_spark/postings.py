"""Relational posting core: (doc_id, term, tf) plus doc/dictionary stats.

Reference analogue:
  * tf per doc        — dict increment, ``Part A/parser_module.py:131-142`` (T4)
  * doc stats         — ``Part A/indexer.py:36-60`` (A1): max_tf, doc_length,
                        singleton count, argmax term
  * dictionary df/cf  — ``Part A/indexer.py:71-76,88-100`` (A2)
  * corpus N / avgdl  — ``Part A/search_engine.py:44-47``, ``Part C/searcher.py:22`` (A3)

The reference holds these in mutable Python dicts; here they are hash
aggregations with map-side partial combine (free in Spark), and postings stay
*rows* until the segment-encode step (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenizer import tokenize_raw_expr, tokenize_raw_udf


def term_frequencies(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_arrow_udf: bool = True,
) -> DataFrame:
    """corpus → (doc_id, term, tf). Docs whose parse is empty are dropped,
    mirroring ``Part C/indexer.py:30-32`` (T19)."""
    tok = tokenize_raw_udf(F.col(text_col)) if use_arrow_udf else tokenize_raw_expr(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), tok.alias("tokens"))
        .filter(F.size("tokens") > 0)
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_arrow_udf: bool = False,
) -> DataFrame:
    """corpus → (doc_id, term, tf, positions): positions are 0-based indices
    in the FILTERED token stream — the same stream the phrase-adjacency
    semantics are defined over (scoring.phrase_match_col), so "merge sort"
    matches "merge the sort". Superset of ``term_frequencies`` output; feeds
    the positional index build (``build_index(with_positions=True)``)."""
    tok = tokenize_raw_udf(F.col(text_col)) if use_arrow_udf else tokenize_raw_expr(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), tok.alias("tokens"))
        .filter(F.size("tokens") > 0)
        .select("doc_id", F.posexplode("tokens").alias("pos", "term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def doc_stats(tf_df: DataFrame) -> DataFrame:
    """(doc_id, term, tf) → per-doc stats (A1). doc_len = Σtf (token count
    after stopword removal, matching ``Part A/parser_module.py:277``)."""
    return tf_df.groupBy("doc_id").agg(
        F.sum("tf").alias("doc_len"),
        F.max("tf").alias("max_tf"),
        F.count(F.lit(1)).alias("distinct_terms"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0)).alias("singleton_terms"),
    )


def dictionary(tf_df: DataFrame) -> DataFrame:
    """(doc_id, term, tf) → (term, df, cf).  df is exact (count of (term,doc)
    pairs ≡ countDistinct because tf_df is already grouped) — exact df is
    required for score-identical BM25 (SURVEY.md §2.3)."""
    return tf_df.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def corpus_stats(stats_df: DataFrame) -> tuple[int, float]:
    """Scalar (N, avgdl) — broadcast to scorers (A3)."""
    row = stats_df.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])
