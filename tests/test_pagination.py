"""search_after deep pagination: cursor-tiled pages must reproduce the
single-shot ranking exactly, at any depth, in both boolean modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 200)
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("pidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


@pytest.mark.parametrize("mode", ["or", "and"])
def test_pages_tile_the_full_ranking(eng, mode):
    q = "spark stream"
    full = eng.search(q, k=10_000, mode=mode, use_wand=False)
    assert len(full) >= 30, "need enough matches to page through"
    paged, cursor = [], None
    while True:
        page = eng.search(q, k=7, mode=mode, after=cursor)
        if not page:
            break
        paged.extend(page)
        cursor = page[-1]
    assert paged == full


def test_cursor_is_the_result_tuple_verbatim(eng):
    full = eng.search("spark", k=20, use_wand=False)
    p2 = eng.search("spark", k=10, after=full[9])
    assert p2 == full[10:20]


def test_past_the_end_returns_empty(eng):
    full = eng.search("dup", k=10_000, use_wand=False)
    assert eng.search("dup", k=5, after=full[-1]) == []


def test_after_composes_with_doc_filter(eng):
    allow = {d for d, _ in eng.search("spark", k=500, use_wand=False)[::2]}
    full = eng.search("spark", k=30, doc_filter=allow, use_wand=False)
    assert len(full) > 10
    p2 = eng.search("spark", k=10, doc_filter=allow, after=full[9])
    assert p2 == full[10:20]
