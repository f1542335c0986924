"""Reindex (ES ``_reindex`` analogue — ``index.build.reindex``): rebuild an
index from its own doc store under new parameters, without the original
input table. Core invariant: a reindex under analyzer X is rank+score
IDENTICAL to a fresh build of the original corpus under analyzer X — the
doc store holds pre-analysis text, so nothing is lost in the round-trip.

Reference parity note: the reference rebuilds its index by re-running the
whole parse pipeline over the raw corpus file (Part A ``indexer.py`` has no
stored-fields path at all); reindex-from-store is the piece a served index
needs once the original table may have moved on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.build import IndexMeta, build_index, reindex
from searchengine_spark.query.engine import SearchEngine

QUERY = "parseQueryString serverConfig"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "def parseQueryString(raw): return raw.split('&')"),
        (2, "class ServerConfig: port = 8080  # parse config"),
        (3, "query = parse_query_string(serverConfig.url)"),
        (4, "plain words about nothing in particular here"),
        (5, "HTTPServer config parser for the query string layer"),
        (6, "miscellaneous filler document with common tokens"),
    ] + [(10 + i, f"filler doc w{i % 3} padding tokens here") for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(spark, df, path, **kw):
    eng = SearchEngine(spark, str(path))
    eng.build_index_from_df(
        df, id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
        fresh=True, **kw,
    )
    return eng


def test_reindex_to_code_analyzer_matches_fresh_build(spark, corpus, tmp_path):
    _build(spark, corpus, tmp_path / "src", store_source=True)
    meta = reindex(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                   analyzer="code")
    assert meta.analyzer == "code"
    assert meta.has_source  # reindexes chain by default
    assert meta.source_text_col == "text"

    fresh = _build(spark, corpus, tmp_path / "fresh", analyzer="code")
    re_eng = SearchEngine(spark, str(tmp_path / "dst"))
    assert re_eng.search(QUERY, k=10) == fresh.search(QUERY, k=10)
    # and the code analyzer actually changed results vs the standard build
    std = SearchEngine(spark, str(tmp_path / "src"))
    assert re_eng.search(QUERY, k=10) != std.search(QUERY, k=10)


def test_reindex_adds_positions_for_phrase(spark, corpus, tmp_path):
    _build(spark, corpus, tmp_path / "src2", store_source=True)
    reindex(spark, str(tmp_path / "src2"), str(tmp_path / "pos"),
            with_positions=True)
    fresh = _build(spark, corpus, tmp_path / "freshpos", with_positions=True)
    re_eng = SearchEngine(spark, str(tmp_path / "pos"))
    got = re_eng.search_phrase("query string", k=10)
    assert got == fresh.search_phrase("query string", k=10)
    assert got  # the phrase does occur


def test_reindex_layout_override_same_results(spark, corpus, tmp_path):
    _build(spark, corpus, tmp_path / "src3", store_source=True)
    reindex(spark, str(tmp_path / "src3"), str(tmp_path / "relayout"),
            n_buckets=4, range_bits=2)
    src = SearchEngine(spark, str(tmp_path / "src3"))
    dst = SearchEngine(spark, str(tmp_path / "relayout"))
    assert dst.meta.n_buckets == 4 and dst.meta.range_bits == 2
    assert dst.search(QUERY, k=10) == src.search(QUERY, k=10)


def test_reindex_chains(spark, corpus, tmp_path):
    _build(spark, corpus, tmp_path / "a", store_source=True)
    reindex(spark, str(tmp_path / "a"), str(tmp_path / "b"), analyzer="code")
    meta = reindex(spark, str(tmp_path / "b"), str(tmp_path / "c"),
                   analyzer="standard")
    assert meta.analyzer == "standard"
    # standard -> code -> standard round-trips to the original ranking
    a = SearchEngine(spark, str(tmp_path / "a"))
    c = SearchEngine(spark, str(tmp_path / "c"))
    assert c.search(QUERY, k=10) == a.search(QUERY, k=10)


def test_reindex_refusals(spark, corpus, tmp_path):
    _build(spark, corpus, tmp_path / "nostore")  # no doc store
    with pytest.raises(ValueError, match="doc store"):
        reindex(spark, str(tmp_path / "nostore"), str(tmp_path / "out"))
    _build(spark, corpus, tmp_path / "samedir", store_source=True)
    with pytest.raises(ValueError, match="dst_dir"):
        reindex(spark, str(tmp_path / "samedir"), str(tmp_path / "samedir"))


def test_reindex_extra_source_columns_survive(spark, corpus, tmp_path):
    """The doc store persists EVERY corpus column; reindex must carry them
    into the new store so fetch after reindex returns the same fields."""
    wide = corpus.withColumn("lang", F.lit("py"))
    _build(spark, wide, tmp_path / "wide", store_source=True)
    reindex(spark, str(tmp_path / "wide"), str(tmp_path / "wide2"))
    eng = SearchEngine(spark, str(tmp_path / "wide2"))
    row = eng.fetch([1]).collect()[0]
    assert row["lang"] == "py" and "parseQueryString" in row["text"]


def test_reindex_old_meta_requires_text_col(spark, corpus, tmp_path):
    """Backward compat: a meta written before source_text_col existed loads
    with the empty default and reindex asks for text_col explicitly."""
    _build(spark, corpus, tmp_path / "old", store_source=True)
    import json
    import os

    mp = os.path.join(str(tmp_path / "old"), "meta.json")
    with open(mp) as f:
        m = json.load(f)
    del m["source_text_col"]
    with open(mp, "w") as f:
        json.dump(m, f)
    assert IndexMeta.load(str(tmp_path / "old")).source_text_col == ""
    with pytest.raises(ValueError, match="text_col"):
        reindex(spark, str(tmp_path / "old"), str(tmp_path / "old2"))
    reindex(spark, str(tmp_path / "old"), str(tmp_path / "old2"),
            text_col="text")
    eng = SearchEngine(spark, str(tmp_path / "old2"))
    assert eng.search(QUERY, k=5)
