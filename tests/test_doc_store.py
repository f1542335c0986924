"""Doc store (store_source=True builds): fetch correctness, partition
pruning (numFiles metric — the scan must touch only the hit ranges'
files), pre-analysis text, and resume behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.build import IndexMeta, read_manifest
from searchengine_spark.query.engine import SearchEngine


def _scan_num_files(df) -> int:
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    leaf = leaves.apply(0)
    return int(leaf.metrics().apply("numFiles").value())


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("store") / "idx"))
    e.build_index_from_df(docs, id_col="doc_id", text_col="text",
                          range_bits=3, n_buckets=4, fresh=True,
                          store_source=True)
    return e


def test_fetch_returns_exact_rows(spark, sf_dir, eng):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {r["doc_id"]: r["text"] for r in docs.limit(5).collect()}
    got = {r["doc_id"]: r["text"] for r in eng.fetch(list(want)).collect()}
    assert got == want
    assert eng.meta.has_source


def test_fetch_scan_is_partition_pruned(eng):
    src_all = eng.spark.read.parquet(f"{eng.index_dir}/source")
    ids = [r["doc_id"] for r in src_all.limit(50).collect()]
    n_parts = 1 << eng.meta.range_bits
    same_part = [d for d in ids if d % n_parts == ids[0] % n_parts][:3]
    total = len(src_all.inputFiles())
    touched = _scan_num_files(eng.fetch(same_part))
    assert total >= n_parts // 2  # the store actually fanned out
    assert touched < total, f"fetch scanned all {total} files"


def test_search_fetch_attaches_source(eng):
    hits = eng.search_fetch("spark join stream", k=5)
    assert len(hits) == 5
    for rank, h in enumerate(hits, 1):
        assert h["rank"] == rank and "text" in h and h["score"] > 0


def test_store_keeps_pre_analysis_text(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "parseQueryString runs"), (2, "other words here")],
        "doc_id long, text string",
    )
    e = SearchEngine(spark, str(tmp_path / "code_idx"))
    e.build_index_from_df(docs, id_col="doc_id", text_col="text",
                          range_bits=1, n_buckets=2, analyzer="code",
                          store_source=True)
    got = e.fetch([1]).collect()[0]["text"]
    assert got == "parseQueryString runs"  # not the split form


def test_no_store_raises(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = SearchEngine(spark, str(tmp_path / "nostore"))
    e.build_index_from_df(docs, id_col="doc_id", text_col="text",
                          range_bits=2, n_buckets=2)
    with pytest.raises(ValueError, match="store_source"):
        e.fetch([1])


def test_resume_skips_completed_store(spark, sf_dir, eng):
    """Re-running the build on the same dir must not rewrite the store
    (manifest marks it done)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = [m for m in read_manifest(eng.index_dir) if m["kind"] == "source"]
    eng.build_index_from_df(docs, id_col="doc_id", text_col="text",
                            range_bits=3, n_buckets=4, store_source=True)
    after = [m for m in read_manifest(eng.index_dir) if m["kind"] == "source"]
    assert len(before) == len(after) == 1


def test_sharded_fetch_routes_and_matches(spark, sf_dir, tmp_path):
    """Sharded store: search_fetch across 3 shards equals the single-index
    result (same global-stats ranking) with each id fetched from its
    OWNING shard."""
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seng = ShardedEngine.build(
        spark, docs, str(tmp_path / "sharded"), 3, id_col="doc_id",
        text_col="text", n_buckets=2, range_bits=2, store_source=True,
    )
    hits = seng.search_fetch("spark join stream", k=5)
    assert len(hits) == 5
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    for rank, h in enumerate(hits, 1):
        assert h["rank"] == rank
        assert h["text"] == want[h["doc_id"]]


def test_sharded_single_pass_store_keeps_all_columns(spark, tmp_path):
    """The single-pass staged build must carry EVERY source column into
    the per-shard doc stores, not just (id, text)."""
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.createDataFrame(
        [(i, f"text {i} alpha beta", f"repo{i % 2}", f"p{i}") for i in range(40)],
        "doc_id long, text string, repo string, path string",
    )
    seng = ShardedEngine.build(
        spark, docs, str(tmp_path / "sp"), 2, id_col="doc_id",
        text_col="text", n_buckets=2, range_bits=1, store_source=True,
        single_pass=True,
    )
    row = seng.fetch([0]).collect()[0]
    assert row["repo"] == "repo0" and row["path"] == "p0"


def test_epoch_layout_store_source_rejected(spark, tmp_path):
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="store_source"):
        ShardedEngine.build(
            spark, docs, str(tmp_path / "ep"), 2, epoch_layout=True,
            store_source=True, n_buckets=2, range_bits=1,
        )
