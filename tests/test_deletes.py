"""Document deletion: Lucene-style tombstones (immediate query-side
exclusion over immutable segments) + physical removal at compaction
(corpus stats / dictionary rebuilt, tombstones consumed).

Reference parity note: the reference keeps its whole index in memory and
rebuilds from scratch to remove a document (`Part A/indexer.py`); deletes
are an engine-hardening extra a mutable 10^12-doc corpus needs."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark import streaming as st
from searchengine_spark.query.engine import SearchEngine

Q = "spark join stream"


@pytest.fixture()
def corpus(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 120
    )


def _build(spark, corpus, tmp_path, name, **kw):
    eng = SearchEngine(spark, str(tmp_path / name))
    eng.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                            n_buckets=4, range_bits=2, **kw)
    return eng


def test_tombstones_hide_docs_immediately(spark, tmp_path, corpus):
    eng = _build(spark, corpus, tmp_path, "idx")
    before = eng.search(Q, k=10)
    assert len(before) == 10
    dead = [before[0][0], before[2][0]]
    assert eng.delete_docs(dead) == 2

    after = eng.search(Q, k=10)
    assert {d for d, _ in after}.isdisjoint(dead)
    assert len(after) == 10  # k refills from below the old cutoff
    # stats untouched pre-compaction → surviving docs keep EXACT scores
    survived = {d: s for d, s in before if d not in dead}
    for d, s in after:
        if d in survived:
            assert s == survived[d]

    # a SECOND handle on the same dir sees the deletes (dir fingerprint)
    eng2 = SearchEngine(spark, eng.index_dir)
    assert {d for d, _ in eng2.search(Q, k=10)}.isdisjoint(dead)


def test_tombstones_apply_to_every_query_path(spark, tmp_path, corpus):
    eng = _build(spark, corpus, tmp_path, "idx")
    or_hits = eng.search(Q, k=30, use_wand=False)
    and_q = "spark the"
    and_hits = eng.search(and_q, k=30, mode="and")
    assert or_hits and and_hits
    dead = sorted({or_hits[0][0], and_hits[0][0]})
    eng.delete_docs(dead)

    for kw in ({"use_wand": False}, {"use_wand": True}):
        assert {d for d, _ in eng.search(Q, k=30, **kw)}.isdisjoint(dead)
    assert {d for d, _ in eng.search(and_q, k=30, mode="and")}.isdisjoint(dead)
    for prune in (False, True):
        res = eng.search_batch({"a": Q, "b": and_q}, k=30, prune=prune)
        for hits in res.values():
            assert {d for d, _ in hits}.isdisjoint(dead)
    bres = eng.search_batch({"b": and_q}, k=30, mode="and")["b"]
    assert {d for d, _ in bres}.isdisjoint(dead)
    # wand == vectorized under tombstones (scores included)
    assert eng.search(Q, k=30, use_wand=True) == eng.search(
        Q, k=30, use_wand=False
    )


def test_phrase_search_excludes_tombstones(spark, tmp_path, corpus):
    eng = _build(spark, corpus, tmp_path, "pidx", with_positions=True)
    hits = eng.search_phrase("the spark", k=20)
    if not hits:
        pytest.skip("fixture corpus has no phrase hit")
    dead = [hits[0][0]]
    eng.delete_docs(dead)
    assert {d for d, _ in eng.search_phrase("the spark", k=20)}.isdisjoint(dead)


def test_compaction_removes_physically_and_rebuilds_stats(
    spark, tmp_path, corpus
):
    eng = _build(spark, corpus, tmp_path, "idx")
    n0 = eng.meta.n_docs
    hits = eng.search(Q, k=5)
    dead = sorted(d for d, _ in hits[:2])
    eng.delete_docs(dead)
    st.ingest.compact_streamed_index(spark, eng.index_dir)

    meta = eng.meta  # fingerprint change → auto refresh
    assert meta.n_docs == n0 - len(dead)
    # tombstones consumed — none left to filter
    tdir = os.path.join(eng.index_dir, "tombstones")
    assert (not os.path.isdir(tdir)) or not any(
        n.endswith(".parquet") for n in os.listdir(tdir)
    )
    # deleted docs are gone from the segments themselves
    segs = spark.read.parquet(os.path.join(eng.index_dir, meta.segments_dir))
    assert segs.count() > 0

    # the compacted index must rank-match a FRESH batch build over the
    # surviving corpus — n_docs, avgdl, df/idf all rebuilt (scores equal up
    # to float avgdl summation order)
    survivors = corpus.filter(~F.col("doc_id").isin([int(d) for d in dead]))
    ref = _build(spark, survivors, tmp_path, "refidx")
    got = eng.search(Q, k=25)
    want = ref.search(Q, k=25)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-9
    )
    # dictionary df shrank for a term the dead docs contained
    tok = Q.split()[0]
    df_new = eng._resolve_terms(tok)[0]["df"]
    df_ref = ref._resolve_terms(tok)[0]["df"]
    assert df_new == df_ref


def test_positional_compaction_keeps_phrase_after_deletes(
    spark, tmp_path, corpus
):
    eng = _build(spark, corpus, tmp_path, "pidx", with_positions=True)
    # k big enough to never cap, so the match SET is comparable across the
    # compaction (scores shift with the rebuilt avgdl/idf; membership can't)
    hits = eng.search_phrase("the spark", k=500)
    if len(hits) < 2:
        pytest.skip("fixture corpus has too few phrase hits")
    dead = [hits[0][0]]
    eng.delete_docs(dead)
    st.ingest.compact_streamed_index(spark, eng.index_dir)
    after = eng.search_phrase("the spark", k=500)
    assert {d for d, _ in after}.isdisjoint(dead)
    assert {d for d, _ in after} == {d for d, _ in hits} - set(dead)


def test_stream_resumes_from_compacted_totals(spark, tmp_path):
    """Epoch → delete → compact → epoch: the post-compaction epoch must
    resume from the REDUCED totals (manifest compaction marker carries the
    post-state), and queries see exactly survivors ∪ new docs."""
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 90
    )
    d = str(tmp_path / "drops")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    src.filter(F.col("doc_id") < 60).write.parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    eng = SearchEngine(spark, idx)
    hits = eng.search(Q, k=5)
    dead = sorted(d_ for d_, _ in hits[:2])
    eng.delete_docs(dead)
    st.ingest.compact_streamed_index(spark, idx)
    assert eng.meta.n_docs == 60 - len(dead)

    src.filter(F.col("doc_id") >= 60).write.mode("append").parquet(d)
    st.incremental_index(st.stream_corpus(spark, d, src.schema), idx, ckpt,
                         n_buckets=4, range_bits=2)
    meta = eng.meta
    assert meta.n_docs == 90 - len(dead)
    got = {d_ for d_, _ in eng.search(Q, k=200)}
    assert got.isdisjoint(dead)
    assert any(d_ >= 60 for d_ in got)  # the new epoch is queryable


def test_delete_by_query_tombstones_match_set(spark, tmp_path, corpus):
    """ES _delete_by_query: the FULL match set is tombstoned via a
    distributed write (no driver id list); matching docs vanish from
    every query, non-matching docs keep exact scores, and a repeat run
    deletes nothing (already-dead docs don't match)."""
    eng = _build(spark, corpus, tmp_path, "idx")
    matched = sorted(
        r["doc_id"] for r in eng.matching_docs("merge").collect()
    )
    assert matched  # fixture sanity
    before = {d: s for d, s in eng.search(Q, k=40, use_wand=False)}

    n = eng.delete_by_query("merge")
    assert n == len(matched)
    # dead everywhere: OR search, AND search, match set, batch
    assert eng.matching_docs("merge").count() == 0
    assert {d for d, _ in eng.search("merge", k=10)} == set()
    after = {d: s for d, s in eng.search(Q, k=40, use_wand=False)}
    assert set(after).isdisjoint(matched)
    for d, s in after.items():
        if d in before:
            assert s == before[d]  # stats untouched pre-compaction

    # idempotent: the matching docs are already dead, so nothing matches
    assert eng.delete_by_query("merge") == 0

    # a second handle picks the tombstones up via the dir fingerprint
    eng2 = SearchEngine(spark, eng.index_dir)
    assert eng2.matching_docs("merge").count() == 0


def test_delete_by_query_and_mode_and_filter(spark, tmp_path, corpus):
    """mode='and' deletes only the conjunctive match set; a doc_filter
    narrows the deletion the same way it narrows search."""
    eng = _build(spark, corpus, tmp_path, "idx")
    both = {r["doc_id"] for r in eng.matching_docs(Q, mode="and").collect()}
    any_ = {r["doc_id"] for r in eng.matching_docs(Q, mode="or").collect()}
    assert both and both < any_  # fixture: AND is a strict subset
    n = eng.delete_by_query(Q, mode="and")
    assert n == len(both)
    left = {r["doc_id"] for r in eng.matching_docs(Q, mode="or").collect()}
    assert left == any_ - both
