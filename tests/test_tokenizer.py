from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from searchengine_spark.tokenizer import (
    duckdb_tokens_cte,
    tokenize_py,
    tokenize_raw_expr,
    tokenize_raw_udf,
    tokenize_expr,
    tokenize_udf,
)

CASES = [
    ("", []),
    ("The THE the", []),
    ("a b c", []),  # single-char tokens excluded
    ("def foo_bar(x2): return x2+1", ["def", "foo_bar", "x2", "return", "x2"]),
    ("Hello WORLD hello", ["hello", "world", "hello"]),
    ("snake_case camelCase kebab-case 42abc", ["snake_case", "camelcase", "kebab", "case", "abc"]),
    ("spark join stream the of to", ["spark", "join", "stream"]),
]


def test_tokenize_py_golden():
    for text, want in CASES:
        assert tokenize_py(text) == want, text


def test_spark_impls_match_py(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)], "i int, text string")
    got = (
        df.select(
            "i",
            tokenize_raw_udf("text").alias("udf"),
            tokenize_raw_expr(F.col("text")).alias("expr"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (text, want) in zip(got, CASES):
        assert row["udf"] == want, f"udf mismatch on {text!r}"
        assert row["expr"] == want, f"expr mismatch on {text!r}"


def test_deduped_impls_agree(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)], "i int, text string")
    got = (
        df.select("i", tokenize_udf("text").alias("udf"), tokenize_expr(F.col("text")).alias("expr"))
        .orderBy("i")
        .collect()
    )
    for row, (text, want) in zip(got, CASES):
        # exact: same elements, same (first-occurrence) order
        assert row["udf"] == row["expr"], f"dedupe mismatch on {text!r}"
        assert row["expr"] == _dedupe_keep_order_ref(want), text


def _dedupe_keep_order_ref(ts: list[str]) -> list[str]:
    seen: set[str] = set()
    return [t for t in ts if not (t in seen or seen.add(t))]


def test_duckdb_cte_matches_py():
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id INT, text VARCHAR)")
    for i, (text, _) in enumerate(CASES):
        con.execute("INSERT INTO docs VALUES (?, ?)", [i, text])
    sql = duckdb_tokens_cte("docs", "doc_id", "text")
    got: dict[int, list[str]] = {}
    for doc_id, term in con.execute(sql).fetchall():
        got.setdefault(doc_id, []).append(term)
    for i, (text, want) in enumerate(CASES):
        assert sorted(got.get(i, [])) == sorted(want), text


def test_testdata_documents_roundtrip(spark, sf_dir):
    """Same token stream from Spark and DuckDB on the real test table."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark_counts = (
        df.select(F.explode(tokenize_raw_expr(F.col("text"))).alias("term"))
        .groupBy("term")
        .count()
        .orderBy("term")
        .collect()
    )
    sql = duckdb_tokens_cte(f"'{sf_dir}/documents.parquet'", "doc_id", "text")
    duck = duckdb.sql(f"SELECT term, count(*) c FROM ({sql}) GROUP BY term ORDER BY term").fetchall()
    assert [(r["term"], r["count"]) for r in spark_counts] == [(t, c) for t, c in duck]
