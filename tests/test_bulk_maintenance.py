"""Distributed bulk maintenance: DataFrame-shaped delete/update batches must
never materialize the id set on the driver (the tombstone write is an
executor-side parquet append, like ``delete_by_query``), and the query-time
tombstone mask must stay BOUNDED under arbitrary churn — past
``tombstone_limit`` raw rows the engine folds tombstones physically via
``compact_streamed_index`` before the next mask build.

Reference anchor: the reference's only maintenance story is rebuild-the-index
(`Part C/indexer.py:91-108`); distributed tombstones are the engine-hardening
this corpus size needs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.streaming.ingest import append_docs

Q = "spark join stream"
COLLECT_CAP = 64  # manifest/stat aggregates are ≤ n_buckets rows; id sets are not


@pytest.fixture()
def corpus(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 400
    )


def _build(spark, corpus, tmp_path, name, **kw):
    eng = SearchEngine(spark, str(tmp_path / name))
    eng.build_index_from_df(
        corpus, id_col="doc_id", text_col="text", n_buckets=4, range_bits=2, **kw
    )
    return eng


def _cap_driver_materialization(monkeypatch, cap=COLLECT_CAP):
    """Any .collect()/.toPandas() during the patched region must return ≤cap
    rows — bulk ids flowing through the driver trip the assert loudly."""
    import pyspark.sql as psql

    orig_collect = psql.DataFrame.collect
    orig_topandas = psql.DataFrame.toPandas

    def capped_collect(self):
        rows = orig_collect(self)
        assert len(rows) <= cap, (
            f"driver collect() of {len(rows)} rows exceeds the {cap}-row bound"
        )
        return rows

    def capped_topandas(self):
        pdf = orig_topandas(self)
        assert len(pdf) <= cap, (
            f"driver toPandas() of {len(pdf)} rows exceeds the {cap}-row bound"
        )
        return pdf

    monkeypatch.setattr(psql.DataFrame, "collect", capped_collect)
    monkeypatch.setattr(psql.DataFrame, "toPandas", capped_topandas)


# -------------------------------------------------------- distributed delete
def test_delete_docs_dataframe_matches_list_path(spark, tmp_path, corpus):
    e1 = _build(spark, corpus, tmp_path, "idx_list")
    e2 = _build(spark, corpus, tmp_path, "idx_df")
    dead = [d for d, _ in e1.search(Q, k=20)][::2]
    assert e1.delete_docs(dead) == len(dead)
    ids_df = spark.createDataFrame([(d,) for d in dead], "doc_id long")
    assert e2.delete_docs(ids_df) == len(dead)
    for q in [Q, "stream window", "filter"]:
        assert e1.search(q, k=15) == e2.search(q, k=15), q


def test_delete_docs_dataframe_never_collects_ids(
    spark, tmp_path, corpus, monkeypatch
):
    eng = _build(spark, corpus, tmp_path, "idx")
    ids_df = corpus.select("doc_id").filter(F.col("doc_id") % 2 == 0)
    n_expect = ids_df.count()
    assert n_expect > COLLECT_CAP
    _cap_driver_materialization(monkeypatch)
    assert eng.delete_docs(ids_df) == n_expect
    # dedup happened distributed: repeat rows add nothing
    assert eng.delete_docs(ids_df) == n_expect  # tombstones append (dedup at mask)


def test_delete_docs_dataframe_null_and_dup_rows(spark, tmp_path, corpus):
    eng = _build(spark, corpus, tmp_path, "idx")
    ids_df = spark.createDataFrame(
        [(1,), (1,), (None,), (2,)], "doc_id long"
    )
    assert eng.delete_docs(ids_df) == 2
    hits = {d for d, _ in eng.search(Q, k=50)}
    assert hits.isdisjoint({1, 2})


# -------------------------------------------------------- distributed update
def test_update_docs_never_collects_ids(spark, tmp_path, monkeypatch):
    rows = [(i, f"spark join term{i % 7}") for i in range(300)]
    df = lambda r: spark.createDataFrame(r, "doc_id long, text string")  # noqa: E731
    idx = str(tmp_path / "uidx")
    append_docs(df(rows), idx, n_buckets=2, range_bits=1)
    eng = SearchEngine(spark, idx)

    updates = df([(i, f"merge sort term{i % 7}") for i in range(0, 300, 2)])
    _cap_driver_materialization(monkeypatch)
    assert eng.update_docs(updates) == 150
    monkeypatch.undo()
    assert {d for d, _ in eng.search("merge", k=200)} == set(range(0, 300, 2))
    assert all(d % 2 for d, _ in eng.search("spark", k=300))


# ------------------------------------------------------ bounded tombstone mask
def test_tombstone_writes_fold_at_the_limit(spark, tmp_path, corpus):
    """WRITE-side churn bound: a tombstone write crossing tombstone_limit
    folds physically right there (even one huge distributed batch never
    reaches a query-time driver read); below the limit files persist."""
    eng = _build(spark, corpus, tmp_path, "idx")
    eng.tombstone_limit = 40
    survivors_eng = _build(
        spark,
        corpus.filter(F.col("doc_id") >= 100),
        tmp_path,
        "idx_survivors",
    )
    tomb_dir = os.path.join(eng.index_dir, "tombstones")
    # wave 1: 60 rows > 40 → folds AT WRITE (dir consumed, stats reduced)
    eng.delete_docs(corpus.select("doc_id").filter(F.col("doc_id") < 60))
    assert not any(n.endswith(".parquet") for n in os.listdir(tomb_dir))
    # wave 2: 40 rows ≤ 40 → plain tombstones, no fold
    eng.delete_docs([d for d in range(60, 100)])
    assert any(n.endswith(".parquet") for n in os.listdir(tomb_dir))
    # masked results == fresh survivor build; wave-3 crossing folds again
    assert {d for d, _ in eng.search(Q, k=25)}.isdisjoint(range(100))
    eng.delete_docs(corpus.select("doc_id").filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 101)
    ))  # 41 raw rows > 40
    assert not any(n.endswith(".parquet") for n in os.listdir(tomb_dir))
    eng.refresh()
    assert eng.meta.n_docs == survivors_eng.meta.n_docs - 1
    assert eng._tombstones() == (None, None, None)


def test_query_side_fold_serves_unchecked_writer_churn(spark, tmp_path, corpus):
    """Safety net for writers that bypass the engine's write-side check:
    raw rows over the reader's limit build the mask through the DISTRIBUTED
    distinct reduction (driver holds one row per distinct doc), serve the
    pre-fold mask, and fold for steady state."""
    writer = _build(spark, corpus, tmp_path, "idx")  # default huge limit
    dead = [int(r[0]) for r in
            corpus.select("doc_id").filter(F.col("doc_id") < 30).collect()]
    for _ in range(3):  # 90 raw rows, 30 distinct
        writer.delete_docs(dead)
    reader = SearchEngine(spark, writer.index_dir, tombstone_limit=50)
    hits = reader.search(Q, k=25)  # raw 90 > 50, distinct 30 ≤ 50 → serves
    assert {d for d, _ in hits}.isdisjoint(dead)
    tomb_dir = os.path.join(writer.index_dir, "tombstones")
    assert not any(n.endswith(".parquet") for n in os.listdir(tomb_dir))
    reader.refresh()
    assert reader.meta.n_docs == corpus.count() - len(dead)


def test_query_side_fold_raises_past_distinct_cap_then_recovers(
    spark, tmp_path, corpus
):
    """Distinct tombstoned docs beyond the reader's limit cannot fit any
    driver mask: the engine folds physically and raises an actionable
    error; the RETRY serves correctly from the folded segments."""
    import pytest as _pytest

    writer = _build(spark, corpus, tmp_path, "idx")
    writer.delete_docs(corpus.select("doc_id").filter(F.col("doc_id") < 30))
    reader = SearchEngine(spark, writer.index_dir, tombstone_limit=10)
    with _pytest.raises(RuntimeError, match="distinct tombstoned docs"):
        reader.search(Q, k=25)
    hits = reader.search(Q, k=25)  # retry: folded index, empty mask
    assert {d for d, _ in hits}.isdisjoint(range(30))
    reader.refresh()
    assert reader.meta.n_docs == corpus.count() - 30


def test_maintenance_lock_blocks_concurrent_folds(spark, tmp_path, corpus):
    import time as _time

    from searchengine_spark.streaming.ingest import (
        MaintenanceInProgress,
        compact_streamed_index,
    )

    eng = _build(spark, corpus, tmp_path, "idx")
    eng.delete_docs([1, 2, 3])
    lock = os.path.join(eng.index_dir, ".maintenance.lock")
    with open(lock, "w") as fh:
        fh.write("99999 now\n")
    with pytest.raises(MaintenanceInProgress):
        compact_streamed_index(spark, eng.index_dir)
    # a stale lock (crashed holder) is stolen and the fold proceeds
    _time_old = _time.time() - 7200
    os.utime(lock, (_time_old, _time_old))
    compact_streamed_index(spark, eng.index_dir)
    assert not os.path.exists(lock)
    eng.refresh()
    assert eng.meta.n_docs == corpus.count() - 3


def test_tombstone_mask_stays_driver_resident_below_limit(spark, tmp_path, corpus):
    eng = _build(spark, corpus, tmp_path, "idx")
    before = eng.search(Q, k=10)
    eng.delete_docs([before[0][0]])
    assert eng.search(Q, k=5)
    tomb_dir = os.path.join(eng.index_dir, "tombstones")
    # below the limit nothing folds — tombstone files persist
    assert any(n.endswith(".parquet") for n in os.listdir(tomb_dir))


# -------------------------------------------------- join-fold compaction
def test_join_fold_compaction_matches_closure_fold(spark, tmp_path, monkeypatch):
    """Past FOLD_CLOSURE_BOUND tombstone rows, compaction folds via a
    distributed anti-join + watermark filter instead of shipping driver
    arrays in the decode closure. The two paths must produce identical
    indexes: same surviving corpus stats, same search results (scores
    included), same phrase results."""
    import shutil

    from searchengine_spark.streaming import ingest

    rows = [(i, f"spark join term{i % 7} stream window") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx_a = str(tmp_path / "fold_a")
    ingest.append_docs(df, idx_a, n_buckets=2, range_bits=1,
                       with_positions=True)
    eng = SearchEngine(spark, idx_a)
    eng.update_docs(
        spark.createDataFrame(
            [(i, f"merge sort term{i % 5}") for i in range(0, 120, 3)],
            "doc_id long, text string",
        )
    )
    eng.delete_docs([i for i in range(0, 120, 4)])

    idx_b = str(tmp_path / "fold_b")
    shutil.copytree(idx_a, idx_b)

    ingest.compact_streamed_index(spark, idx_a)  # closure fold (default)
    monkeypatch.setattr(ingest, "FOLD_CLOSURE_BOUND", 0)
    ingest.compact_streamed_index(spark, idx_b)  # join fold (forced)

    ea, eb = SearchEngine(spark, idx_a), SearchEngine(spark, idx_b)
    assert ea.meta.n_docs == eb.meta.n_docs
    assert ea.meta.avgdl == eb.meta.avgdl
    for q in ["spark join", "merge sort", "stream window", "term1"]:
        assert ea.search(q, k=50) == eb.search(q, k=50), q
    assert ea.search_phrase("merge sort", k=50) == eb.search_phrase(
        "merge sort", k=50
    )
    # join fold consumed the tombstones physically, like the closure fold
    assert ingest._tombstone_files(idx_b) == []


def test_join_fold_tiered_merge_matches_closure_fold(spark, tmp_path, monkeypatch):
    """Tiered merge under the join fold: folding renumbers postings up to
    max(folded ids), so update watermarks MUST apply during the merge —
    the join path has to keep exactly the closure path's survivors."""
    import shutil

    from searchengine_spark.streaming import ingest

    df = lambda r: spark.createDataFrame(r, "doc_id long, text string")  # noqa: E731
    idx_a = str(tmp_path / "tm_a")
    # several small epochs so the merge has a tail to fold
    ingest.append_docs(df([(i, f"spark join term{i % 5}") for i in range(30)]),
                       idx_a, n_buckets=2, range_bits=1)
    eng = SearchEngine(spark, idx_a)
    for lo in (30, 60, 90):
        ingest.append_docs(
            df([(i, f"stream window term{i % 5}") for i in range(lo, lo + 30)]),
            idx_a,
        )
    eng.update_docs(df([(i, f"merge sort term{i % 3}") for i in range(0, 120, 6)]))
    eng.delete_docs([i for i in range(0, 120, 8)])

    idx_b = str(tmp_path / "tm_b")
    shutil.copytree(idx_a, idx_b)

    ingest.merge_epochs_tiered(spark, idx_a, max_segments=2)  # closure fold
    monkeypatch.setattr(ingest, "FOLD_CLOSURE_BOUND", 0)
    ingest.merge_epochs_tiered(spark, idx_b, max_segments=2)  # join fold

    ea, eb = SearchEngine(spark, idx_a), SearchEngine(spark, idx_b)
    for q in ["spark join", "merge sort", "stream window", "term2"]:
        assert ea.search(q, k=60) == eb.search(q, k=60), q
    # superseded versions stayed dead after renumbering (watermark rule)
    assert all(d % 6 for d, _ in eb.search("spark", k=60))


def test_sharded_delete_dataframe_routes_distributed(spark, tmp_path, monkeypatch):
    """ShardedEngine.delete(DataFrame): ids route by the build's JVM hash
    and tombstone each owning shard without any driver id collect; results
    identical to the explicit-list path."""
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 300
    )
    sa = ShardedEngine.build(
        spark, docs, str(tmp_path / "sh_a"), n_shards=3,
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    sb = ShardedEngine.build(
        spark, docs, str(tmp_path / "sh_b"), n_shards=3,
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    dead = [d for d, _ in sa.search(Q, k=30)][::2]
    assert sa.delete(dead) == len(dead)
    ids_df = spark.createDataFrame([(d,) for d in dead], "doc_id long")
    _cap_driver_materialization(monkeypatch)
    assert sb.delete(ids_df) == len(dead)
    monkeypatch.undo()
    for q in [Q, "stream window"]:
        assert sa.search(q, k=20) == sb.search(q, k=20), q


def test_sharded_delete_by_query_matches_single_index(spark, tmp_path):
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 300
    )
    seng = ShardedEngine.build(
        spark, docs, str(tmp_path / "shq"), n_shards=3,
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    single = _build(spark, docs, tmp_path, "sq_single")
    n_s = seng.delete_by_query("merge sort", mode="and")
    n_1 = single.delete_by_query("merge sort", mode="and")
    assert n_s == n_1 > 0
    assert [d for d, _ in seng.search(Q, k=20)] == [
        d for d, _ in single.search(Q, k=20)
    ]


def test_sharded_compact_folds_every_shard(spark, tmp_path):
    """ShardedEngine.compact: per-shard fold — deletes become physical,
    aggregated stats drop to the survivor corpus, results match a fresh
    sharded build of the survivors."""
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 240
    )
    seng = ShardedEngine.build(
        spark, docs, str(tmp_path / "shc"), n_shards=3,
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    seng.delete(docs.select("doc_id").filter(F.col("doc_id") < 80))
    seng.compact()
    assert seng.stats()["n_docs"] == docs.filter(F.col("doc_id") >= 80).count()
    fresh = ShardedEngine.build(
        spark, docs.filter(F.col("doc_id") >= 80), str(tmp_path / "shf"),
        n_shards=3, id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    for q in [Q, "stream window"]:
        assert seng.search(q, k=20) == fresh.search(q, k=20), q


def test_sharded_update_by_query_matches_single_index(spark, tmp_path):
    from searchengine_spark.query.sharded import ShardedEngine
    from searchengine_spark.streaming.ingest import append_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 240
    )
    seng = ShardedEngine.build(
        spark, docs, str(tmp_path / "shu"), n_shards=3,
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
        epoch_layout=True,
    )
    idx1 = str(tmp_path / "su_single")
    append_docs(docs, idx1, n_buckets=2, range_bits=1)
    single = SearchEngine(spark, idx1)

    tf = lambda df: df.withColumn(  # noqa: E731
        "text", F.concat(F.col("text"), F.lit(" patchedtoken"))
    )
    n_s = seng.update_by_query("stream window", tf, mode="and", corpus_df=docs)
    n_1 = single.update_by_query("stream window", tf, mode="and", corpus_df=docs)
    assert n_s == n_1 > 0
    assert {d for d, _ in seng.search("patchedtoken", k=300)} == {
        d for d, _ in single.search("patchedtoken", k=300)
    }


def test_stats_reports_churn_regime_without_folding(spark, tmp_path, corpus):
    """stats() stays a control-plane call at any churn level: below the
    limit it reports exact tombstone counts; above it, the raw row count
    with counts marked inexact — and it must NOT trigger the fold."""
    eng = _build(spark, corpus, tmp_path, "idx")
    eng.delete_docs([1, 2, 3])
    st = eng.stats()
    assert st["n_deleted"] == 3 and st["tombstone_counts_exact"] is True
    assert st["next_fold_mode"] == "closure"
    assert st["maintenance_locked"] is False
    # unchecked-writer scenario: reader with a tiny limit
    reader = SearchEngine(spark, eng.index_dir, tombstone_limit=1)
    st2 = reader.stats()
    assert st2["tombstone_counts_exact"] is False
    assert st2["n_deleted"] is None
    assert st2["tombstone_raw_rows"] == 3
    tomb_dir = os.path.join(eng.index_dir, "tombstones")
    assert any(n.endswith(".parquet") for n in os.listdir(tomb_dir))  # no fold


def test_update_crossing_limit_folds_mid_update(spark, tmp_path):
    """update_docs whose tombstone write crosses the limit: the fold runs
    BETWEEN the tombstone write and the new-version append — old versions
    drop physically (all their epochs ≤ the watermark), the append then
    re-adds the docs as a fresh epoch, and stats come out exact."""
    df = lambda r: spark.createDataFrame(r, "doc_id long, text string")  # noqa: E731
    idx = str(tmp_path / "midx")
    append_docs(df([(i, f"spark join term{i % 5}") for i in range(100)]),
                idx, n_buckets=2, range_bits=1)
    eng = SearchEngine(spark, idx)
    eng.tombstone_limit = 30
    assert eng.update_docs(
        df([(i, f"merge sort term{i % 5}") for i in range(50)])
    ) == 50
    tomb_dir = os.path.join(idx, "tombstones")
    assert not os.path.isdir(tomb_dir) or not any(
        n.endswith(".parquet") for n in os.listdir(tomb_dir)
    )
    assert {d for d, _ in eng.search("merge", k=100)} == set(range(50))
    assert {d for d, _ in eng.search("spark", k=100)} == set(range(50, 100))
    eng.refresh()
    assert eng.meta.n_docs == 100


def test_term_vectors_mask_survives_in_query_fold(spark, tmp_path):
    """ADVICE r4 (medium): an in-query auto-fold renumbers surviving doc
    versions to epoch 0; a pre-fold mask's update watermarks applied to the
    POST-fold segments would kill those live docs. term_vectors must bind
    its segment scan BEFORE the mask build (search()'s ordering) so the
    pre-fold mask meets pre-fold epoch numbering."""
    df = lambda r: spark.createDataFrame(r, "doc_id long, text string")  # noqa: E731
    idx = str(tmp_path / "tvidx")
    append_docs(df([(i, f"alpha beta term{i % 5}") for i in range(60)]),
                idx, n_buckets=2, range_bits=1)
    writer = SearchEngine(spark, idx)  # default huge limit: no write-side fold
    # two update rounds -> 2 upd-tombstone rows per doc (raw 60, distinct 30)
    assert writer.update_docs(
        df([(i, f"gamma delta term{i % 5}") for i in range(30)])) == 30
    assert writer.update_docs(
        df([(i, f"omega sigma term{i % 5}") for i in range(30)])) == 30
    reader = SearchEngine(spark, idx, tombstone_limit=40)  # raw 60 > 40 ≥ 30
    tv = reader.term_vectors(list(range(30))).toPandas()
    # the in-query fold must have consumed the tombstones…
    tomb_dir = os.path.join(idx, "tombstones")
    assert not any(n.endswith(".parquet") for n in os.listdir(tomb_dir))
    # …and the LATEST versions of the updated docs are alive in the vectors
    assert set(tv["doc_id"]) == set(range(30))
    by_doc = tv.groupby("doc_id")["term"].apply(set)
    for d in range(30):
        assert "omega" in by_doc[d] and "sigma" in by_doc[d]
        assert "alpha" not in by_doc[d] and "gamma" not in by_doc[d]
    # fresh handle post-fold agrees (ground truth from the folded segments)
    reader.refresh()
    tv2 = reader.term_vectors(list(range(30))).toPandas()
    assert set(tv2["doc_id"]) == set(range(30))


def test_significant_terms_mask_survives_in_query_fold(spark, tmp_path):
    """Same hazard through the significant_terms path (its postings scan
    also runs over _all_blocks after the mask build)."""
    df = lambda r: spark.createDataFrame(r, "doc_id long, text string")  # noqa: E731
    idx = str(tmp_path / "stidx")
    append_docs(
        df([(i, "alpha beta " + ("signal noise" if i < 30 else "quiet calm"))
            for i in range(60)]),
        idx, n_buckets=2, range_bits=1)
    writer = SearchEngine(spark, idx)
    for _ in range(2):  # raw 60 upd rows, 30 distinct
        assert writer.update_docs(
            df([(i, "alpha beta signal noise") for i in range(30)])) == 30
    reader = SearchEngine(spark, idx, tombstone_limit=40)
    out = reader.significant_terms("alpha", min_fg=1, top_n=50).toPandas()
    assert not any(n.endswith(".parquet")
                   for n in os.listdir(os.path.join(idx, "tombstones")))
    # the updated docs are alive: their distinctive terms must show up with
    # the full 30-doc foreground frequency, not a masked-out 0
    fg = dict(zip(out["term"], out["fg_df"]))
    assert fg.get("signal") == 30 and fg.get("noise") == 30


def test_lock_release_is_token_guarded(tmp_path):
    """ADVICE r4 (low): a fold overrunning stale_sec has its lock stolen;
    its release must NOT delete the thief's lock (that would admit a third
    fold into the segments_c{K} collision)."""
    import time as _time

    from searchengine_spark.streaming.ingest import (
        MaintenanceInProgress,
        _maintenance_lock_acquire,
        _maintenance_lock_release,
    )

    idx = str(tmp_path)
    lock1, tok1 = _maintenance_lock_acquire(idx)
    old = _time.time() - 7200
    os.utime(lock1, (old, old))
    lock2, tok2 = _maintenance_lock_acquire(idx)  # steals the stale lock
    assert lock1 == lock2 and tok1 != tok2
    _maintenance_lock_release(lock1, tok1)  # overrunning holder returns late
    assert os.path.exists(lock2), "thief's lock must survive the late release"
    with pytest.raises(MaintenanceInProgress):
        _maintenance_lock_acquire(idx)
    _maintenance_lock_release(lock2, tok2)  # rightful holder releases
    assert not os.path.exists(lock2)


def test_churned_index_rank_identical_to_fresh_survivor_build(spark, tmp_path):
    """The bench `maintenance_churn` component's correctness twin: after
    delete_by_query + update_docs + physical fold, the churned index must
    rank (doc_id, score) IDENTICALLY to a fresh build of the equivalent
    final corpus (survivors + updated texts) — compaction rebuilds corpus
    stats from survivors, so no residual of the deleted/old versions may
    leak into df/idf/avgdl or the postings."""
    from searchengine_spark.streaming.ingest import compact_streamed_index

    df = lambda r: spark.createDataFrame(r, "doc_id long, text string")  # noqa: E731
    rows = [(i, f"spark join stream term{i % 7} extra{i % 3}") for i in range(200)]
    idx = str(tmp_path / "churn")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(df(rows), id_col="doc_id", text_col="text",
                            n_buckets=4, range_bits=2)
    compact_streamed_index(spark, idx)  # epoch layout
    eng.refresh()
    # churn: delete doc_id % 5 == 0, update doc_id % 5 == 1
    eng.delete_docs([i for i, _ in rows if i % 5 == 0])
    updated = [(i, f"merge sort stream term{i % 7}") for i, _ in rows if i % 5 == 1]
    assert eng.update_docs(df(updated)) == len(updated)
    compact_streamed_index(spark, idx)  # fold everything physically
    eng.refresh()

    final_rows = [(i, t) for i, t in rows if i % 5 not in (0, 1)] + updated
    fresh = SearchEngine(spark, str(tmp_path / "fresh"))
    fresh.build_index_from_df(df(final_rows), id_col="doc_id",
                              text_col="text", n_buckets=4, range_bits=2)

    assert eng.meta.n_docs == fresh.meta.n_docs == len(final_rows)
    assert abs(eng.meta.avgdl - fresh.meta.avgdl) < 1e-9
    for q in ("spark join stream", "merge sort", "term3 extra1"):
        a = [(d, round(s, 9)) for d, s in eng.search(q, k=50)]
        b = [(d, round(s, 9)) for d, s in fresh.search(q, k=50)]
        assert a == b, q


def test_lock_heartbeat_keeps_live_fold_unstealable(tmp_path):
    """A live fold's heartbeat refreshes the lock mtime, so even a lock
    older than stale_sec on paper cannot be stolen while the holder is
    alive; the heartbeat stops refreshing the moment the file carries
    someone else's token."""
    import time as _time

    from searchengine_spark.streaming.ingest import (
        MaintenanceInProgress,
        _LockHeartbeat,
        _maintenance_lock_acquire,
        _maintenance_lock_release,
    )

    idx = str(tmp_path)
    lock, tok = _maintenance_lock_acquire(idx)
    hb = _LockHeartbeat(lock, tok, interval=0.1)
    try:
        old = _time.time() - 7200
        os.utime(lock, (old, old))  # simulate "looks stale"
        _time.sleep(0.4)  # heartbeat refreshes it
        assert _time.time() - os.stat(lock).st_mtime < 10
        with pytest.raises(MaintenanceInProgress):
            _maintenance_lock_acquire(idx)
        # steal scenario: replace the file with a thief's token — the
        # heartbeat must stop touching it. Let a full interval pass after
        # the write BEFORE backdating, so any read-token-then-utime pair
        # already in flight (which read OUR token) has landed and the
        # thread has since seen the thief token and exited — the mtime
        # check below is then race-free.
        with open(lock, "w") as fh:
            fh.write("thief:cafebabe 0\n")
        _time.sleep(0.3)
        os.utime(lock, (old, old))
        _time.sleep(0.4)
        assert os.stat(lock).st_mtime == pytest.approx(old, abs=2)
    finally:
        hb.stop()
    _maintenance_lock_release(lock, tok)  # token mismatch → leaves the file
    assert os.path.exists(lock)
    os.remove(lock)
