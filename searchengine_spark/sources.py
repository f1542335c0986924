"""Sources & sinks (SURVEY.md §2.1).

S1-S3 (parquet corpus scans) are plain ``spark.read.parquet`` /
``spark.read.table`` — ``CorpusSource`` wraps the Iceberg-or-Parquet choice.
S4/S5 are the reference's tiny query/qrels files; S7 the CSV results sink
(``Part A/search_engine.py:96-112``); S9 the preprocessed-corpus text sink
(``Part C/preprocessor.py:36-64``). S8 (pickled index) is replaced by the
segment/dictionary/manifest Parquet layout in index/build.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .tokenizer import tokenize_raw_expr

QUERIES_SCHEMA = StructType(
    [
        StructField("query_id", IntegerType()),
        StructField("information_need", StringType()),
        StructField("keywords", StringType()),
    ]
)

QRELS_SCHEMA = StructType(
    [
        StructField("query", IntegerType()),
        StructField("doc_id", StringType()),
        StructField("y_true", IntegerType()),
    ]
)


class CorpusSource:
    """Iceberg table when a catalog table name is configured, else Parquet
    with the identical (repo, path, commit, lang, content) schema
    (SURVEY.md §7 — no Iceberg jars in this sandbox, tests use Parquet)."""

    def __init__(self, table: str | None = None, path: str | None = None):
        # truthiness, not `is None`: read() dispatches on truthiness, so an
        # empty-string table would pass an is-None check here and then
        # misroute to spark.read.parquet(None) far from this call site
        if bool(table) == bool(path):
            raise ValueError("exactly one of table/path required (non-empty)")
        self.table = table
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        if self.table:
            return spark.read.table(self.table)
        return spark.read.parquet(self.path)


def read_queries_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S4: reference-style TSV (``Part C/data/queries_train.tsv`` shape,
    read at ``Part C/test_part_c_students_old.py:66``)."""
    return spark.read.csv(path, sep="\t", header=True, schema=QUERIES_SCHEMA)


def read_qrels_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5: qrels with the reference's dtype contract
    (``Part C/test_part_c_students_old.py:54-56``)."""
    return spark.read.csv(path, header=True, schema=QRELS_SCHEMA)


def write_results_csv(results: DataFrame, path: str) -> None:
    """S7: ranked (query, doc_id, score[, rank]) → CSV
    (``Part A/search_engine.py:96-112``)."""
    results.write.mode("overwrite").option("header", True).csv(path)


def write_preprocessed_text(
    df: DataFrame, path: str, text_col: str = "content"
) -> None:
    """S9: one line per doc of space-joined tokens (embedding-training corpus,
    ``Part C/preprocessor.py:36-64``)."""
    df.select(
        F.concat_ws(" ", tokenize_raw_expr(F.col(text_col))).alias("value")
    ).write.mode("overwrite").text(path)


def backfill_text(results: DataFrame, corpus: DataFrame, id_col: str = "doc_id",
                  text_col: str = "content") -> DataFrame:
    """J5: doc_id → full text backfill (``Part A/export_tweet_full_text.py:5-12``)."""
    return results.join(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col)), "doc_id", "left"
    )
