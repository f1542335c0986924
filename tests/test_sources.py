from __future__ import annotations

import glob

from searchengine_spark.corpus import corpus_df
from searchengine_spark.sources import (
    CorpusSource,
    backfill_text,
    read_qrels_csv,
    read_queries_tsv,
    write_preprocessed_text,
    write_results_csv,
)


def test_queries_tsv_roundtrip(spark, tmp_path):
    p = tmp_path / "queries.tsv"
    p.write_text("query_id\tinformation_need\tkeywords\n1\tneed one\tspark join\n2\tneed two\thash merge\n")
    df = read_queries_tsv(spark, str(p))
    rows = df.orderBy("query_id").collect()
    assert [(r["query_id"], r["keywords"]) for r in rows] == [(1, "spark join"), (2, "hash merge")]


def test_qrels_csv(spark, tmp_path):
    p = tmp_path / "qrels.csv"
    p.write_text("query,doc_id,y_true\n1,123,1\n1,456,0\n")
    df = read_qrels_csv(spark, str(p))
    assert df.count() == 2
    assert dict(df.dtypes)["query"] == "int"
    assert dict(df.dtypes)["doc_id"] == "string"


def test_results_csv_sink(spark, tmp_path):
    df = spark.createDataFrame([(1, 10, 0.5), (1, 11, 0.4)], "query int, doc_id int, score double")
    out = str(tmp_path / "results")
    write_results_csv(df, out)
    back = spark.read.csv(out, header=True)
    assert back.count() == 2


def test_preprocessed_text_sink(spark, tmp_path):
    df = corpus_df(spark, 10, seed=2)
    out = str(tmp_path / "pre")
    write_preprocessed_text(df, out)
    lines = spark.read.text(out).collect()
    assert len(lines) == 10
    assert all(" " in r["value"] for r in lines)


def test_backfill_and_corpus_source(spark, tmp_path):
    df = corpus_df(spark, 10, seed=2)
    p = str(tmp_path / "corpus")
    df.write.parquet(p)
    src = CorpusSource(path=p).read(spark)
    assert src.count() == 10
    results = src.select("doc_id").limit(3)
    bf = backfill_text(results, src)
    rows = bf.collect()
    assert len(rows) == 3
    assert all(r["content"] for r in rows)
