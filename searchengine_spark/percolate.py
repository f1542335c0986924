"""Percolator — reverse search (Elasticsearch percolate queries, Lucene
Monitor/Luwak): STORE the queries, stream the documents, and for each
incoming document report which saved queries match it. The alerting /
saved-search primitive: "tell me when a doc matching <query> arrives."

Reference parity note: the reference has no reverse-search surface; this
is the engine-completion analogue of its forward search path, built on
the same tokenizer so a percolate match means exactly "``search`` would
have returned this doc for that query".

Scale shape: the saved-query table is small next to a 10^12-doc corpus
(10^4-10^6 alerts), so its (query_id, term) set BROADCASTS and the
document side is one tokenize → semi-join → count pass — per-batch cost
is linear in matched (doc, query) pairs, with zero shuffle of the corpus
tokens. mode='and' (all query terms present) and mode='or' (any) follow
the forward engine's semantics, including the stopword-only-query rule
(no terms → matches nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenizer import duckdb_tokens_cte, tokenize_expr


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query",
    mode_col: str | None = "mode",
) -> DataFrame:
    """→ DataFrame[doc_id, query_id]: every (document, saved query) pair
    where the doc matches under the query's mode ('or' = any term,
    'and' = every term; ``mode_col=None`` treats all queries as 'or').
    Same tokenizer as indexing/search on BOTH sides."""
    # NO .distinct() here: tokenize_expr already dedupes in-row
    # (array_except), and a distinct would hash-shuffle the ENTIRE corpus
    # token stream before the broadcast semi-join — the exact full-corpus
    # shuffle the contract above rules out
    dt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_expr(F.col(text_col))).alias("term"),
    )
    mode = (
        F.lower(F.col(mode_col)) if mode_col is not None else F.lit("or")
    )
    qt = queries.select(
        F.col(qid_col).alias("query_id"),
        mode.alias("mode"),
        F.explode(tokenize_expr(F.col(qtext_col))).alias("term"),
    ).distinct()
    qn = qt.groupBy("query_id", "mode").agg(F.count(F.lit(1)).alias("n_terms"))
    hits = (
        dt.join(F.broadcast(qt.select("query_id", "term")), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    return (
        hits.join(F.broadcast(qn), "query_id")
        .filter((F.col("mode") == "or") | (F.col("m") == F.col("n_terms")))
        .select("doc_id", "query_id")
    )


def percolate_sql(
    docs_table: str,
    queries_values: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin. ``queries_values`` is a VALUES list for a
    (query_id, query, mode) CTE."""
    return f"""
WITH q(query_id, query, mode) AS (VALUES {queries_values}),
dt AS (SELECT DISTINCT doc_id, term
       FROM ({duckdb_tokens_cte(docs_table, id_col, text_col)})),
qt AS (SELECT DISTINCT query_id, lower(mode) AS mode, term
       FROM ({duckdb_tokens_cte("q", "query_id", "query")})
            AS t(query_id, term)
       JOIN q USING (query_id)),
qn AS (SELECT query_id, mode, count(*)::BIGINT AS n_terms
       FROM qt GROUP BY 1, 2),
hits AS (SELECT dt.doc_id, qt.query_id, count(*)::BIGINT AS m
         FROM dt JOIN qt USING (term) GROUP BY 1, 2)
SELECT h.doc_id AS doc_id, h.query_id AS query_id
FROM hits h JOIN qn USING (query_id)
WHERE qn.mode = 'or' OR h.m = qn.n_terms
"""
