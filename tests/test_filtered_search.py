"""Metadata-filtered search: an allow-set (`doc_filter`) restricts every
query path to the given doc_ids while scores keep corpus-wide statistics —
the standard filtered-search semantics (filtering never changes idf/avgdl).

Reference parity note: the reference has no filtered search; this is the
engine-hardening surface a multi-tenant / faceted corpus needs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine

Q = "spark join stream"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("fidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2, with_positions=True)
    return e


def _expect(unfiltered, allow, k):
    """Ground truth: unfiltered ranking restricted to the allow-set, cut at
    k — scores must be unchanged (corpus-wide stats)."""
    return [(d, s) for d, s in unfiltered if d in allow][:k]


def test_filtered_or_search_both_kernels(eng):
    base = eng.search(Q, k=500, use_wand=False)
    assert len(base) > 20
    allow = {d for d, _ in base[::3]}  # every 3rd hit, incl. top docs
    want = _expect(base, allow, 10)
    for use_wand in (False, True):
        got = eng.search(Q, k=10, use_wand=use_wand, doc_filter=allow)
        assert got == want


def test_filtered_and_batch_phrase(eng):
    and_q = "spark the"
    base_and = eng.search(and_q, k=500, mode="and")
    allow = {d for d, _ in base_and[1::2]}
    assert eng.search(and_q, k=8, mode="and", doc_filter=allow) == _expect(
        base_and, allow, 8
    )

    base_or = eng.search(Q, k=500, use_wand=False)
    allow2 = {d for d, _ in base_or[::2]}
    for prune in (False, True):
        res = eng.search_batch({"a": Q, "b": and_q}, k=8, prune=prune,
                               doc_filter=allow2)
        assert res["a"] == _expect(base_or, allow2, 8)

    base_ph = eng.search_phrase("the spark", k=500)
    if base_ph:
        allow3 = {d for d, _ in base_ph[::2]}
        assert eng.search_phrase("the spark", k=8, doc_filter=allow3) == _expect(
            base_ph, allow3, 8
        )


def test_filter_composes_with_tombstones(eng, spark, tmp_path):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)
    e = SearchEngine(spark, str(tmp_path / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    base = e.search(Q, k=500)
    allow = [d for d, _ in base[:6]]
    e.delete_docs(allow[:2])
    got = e.search(Q, k=10, doc_filter=allow)
    assert [d for d, _ in got] == allow[2:6]


def test_filter_accepts_dataframe_and_empty_set(eng, spark):
    base = eng.search(Q, k=500, use_wand=False)
    allow = [d for d, _ in base[:5]]
    fdf = spark.createDataFrame([(d,) for d in allow], "doc_id long")
    assert eng.search(Q, k=10, doc_filter=fdf) == _expect(base, set(allow), 10)
    assert eng.search(Q, k=10, doc_filter=[]) == []
