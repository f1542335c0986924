"""Tiered epoch merge (Lucene TieredMergePolicy analogue): fold only the
SMALLEST streamed epochs into one, never the whole index — bounded write
amplification, bounded per-term fragmentation, query results identical.

Invariants under test: result identity across every query path, the
segment budget, smallest-first victim selection, stats untouched,
delete/update masks applied at each folded block's ORIGINAL epoch, the
compacted base never folded, appends landing in the post-merge dir, and
crash-recovery deriving the post-merge segments dir from the manifest."""

from __future__ import annotations

import os

import pytest

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.streaming.ingest import (
    append_docs,
    compact_streamed_index,
    merge_epochs_tiered,
    read_stream_manifest,
)

# five epochs with distinct sizes: epoch sizes 4, 1, 2, 1, 3 docs
EPOCHS = [
    [(1, "spark join spark filter"), (2, "stream window stream stream"),
     (3, "join filter window batch"), (4, "spark stream join window")],
    [(5, "merge sort merge column")],
    [(6, "spark merge stream"), (7, "filter batch column")],
    [(8, "window window join")],
    [(9, "sort column batch"), (10, "spark spark merge"),
     (11, "stream filter sort")],
]
QUERIES = ["spark", "stream window", "merge sort", "join filter batch"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _epoch_dirs(index_dir: str) -> list[str]:
    from searchengine_spark.index.build import IndexMeta

    seg = os.path.join(index_dir, IndexMeta.load(index_dir).segments_dir)
    return sorted(n for n in os.listdir(seg) if n.startswith("epoch="))


@pytest.fixture()
def eng(spark, tmp_path):
    idx = str(tmp_path / "idx")
    for rows in EPOCHS:
        append_docs(_df(spark, rows), idx, n_buckets=2, range_bits=1,
                    with_positions=True)
    return SearchEngine(spark, idx)


def test_merge_preserves_results_and_respects_budget(spark, eng):
    before = {q: eng.search(q, k=20) for q in QUERIES}
    before_and = eng.search("spark merge", k=20, mode="and")
    stats0 = (eng.meta.n_docs, eng.meta.avgdl, eng.meta.total_len)

    meta = merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    assert len(_epoch_dirs(eng.index_dir)) == 3
    # stats untouched — merge moves bytes, not the corpus
    assert (meta.n_docs, meta.avgdl, meta.total_len) == stats0

    e2 = SearchEngine(spark, eng.index_dir)  # fresh handle, post-merge meta
    for q in QUERIES:
        assert e2.search(q, k=20) == before[q], q
    assert e2.search("spark merge", k=20, mode="and") == before_and
    # phrase path (positional streams re-encoded through the merge)
    assert {d for d, _ in e2.search_phrase("merge sort", k=10)} == {5}


def test_merge_folds_smallest_epochs(spark, eng):
    merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    from searchengine_spark.index.build import read_manifest

    marker = [m for m in read_manifest(eng.index_dir)
              if m.get("kind") == "merge"][-1]
    # sizes were 4,1,2,1,3 docs for epochs 0..4 → the three smallest are
    # epochs 1 (1 doc), 3 (1 doc), 2 (2 docs); merged id keeps the max
    assert marker["epochs_folded"] == [1, 2, 3]
    assert marker["merged_epoch"] == 3
    dirs = _epoch_dirs(eng.index_dir)
    assert "epoch=0" in dirs and "epoch=4" in dirs and "epoch=3" in dirs


def test_merge_noop_under_budget(spark, eng):
    meta0 = merge_epochs_tiered(spark, eng.index_dir, max_segments=5)
    assert len(_epoch_dirs(eng.index_dir)) == 5
    assert meta0.segments_dir == "segments"
    with pytest.raises(ValueError):
        merge_epochs_tiered(spark, eng.index_dir, max_segments=0)


def test_merge_applies_deletes_and_updates_physically(spark, eng):
    """A doc deleted and a doc updated inside folded epochs: the merged
    blocks drop the dead/superseded postings, results match the masked
    pre-merge state, and the re-masking at query time stays a no-op."""
    eng.delete_docs([5])                                   # epoch 1 (folded)
    eng.update_docs(_df(spark, [(8, "quorum quorum")]))    # epoch 3 folded
    before = {q: eng.search(q, k=20) for q in QUERIES + ["quorum"]}

    merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    e2 = SearchEngine(spark, eng.index_dir)
    for q in before:
        assert e2.search(q, k=20) == before[q], q
    assert dict(e2.search("merge sort", k=20)).keys().isdisjoint({5})
    assert {d for d, _ in e2.search("quorum", k=5)} == {8}
    # window (old doc-8 content) must not resurrect from the merged blocks
    assert 8 not in dict(e2.search("window", k=20))
    # tombstone files survive a tiered merge (unmerged epochs + the doc
    # store may still need them; only full compaction consumes them)
    tomb = os.path.join(eng.index_dir, "tombstones")
    assert os.path.isdir(tomb) and any(
        n.endswith(".parquet") for n in os.listdir(tomb)
    )


def test_append_after_merge_lands_in_new_dir_and_manifest_recovers(spark, eng):
    merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    append_docs(_df(spark, [(12, "spark quasar")]), eng.index_dir)
    e2 = SearchEngine(spark, eng.index_dir)
    assert 12 in dict(e2.search("spark", k=20))
    # the new epoch sits in the post-merge versioned dir (manifest-derived
    # segments_dir — the _last_segdir override, not stale compaction state)
    assert e2.meta.segments_dir.startswith("segments_m")
    assert "epoch=5" in _epoch_dirs(eng.index_dir)
    # lineage: every pre-merge epoch line is still in the stream manifest
    epochs = {m["epoch"] for m in read_stream_manifest(eng.index_dir)}
    assert epochs == {0, 1, 2, 3, 4, 5}


def test_compaction_after_merge_folds_everything(spark, eng):
    before = {q: eng.search(q, k=20) for q in QUERIES}
    merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    meta = compact_streamed_index(spark, eng.index_dir)
    assert meta.stream_epochs == 0
    assert _epoch_dirs(eng.index_dir) == ["epoch=0"]
    e2 = SearchEngine(spark, eng.index_dir)
    for q in QUERIES:
        assert e2.search(q, k=20) == before[q], q


def test_merge_never_folds_compacted_base(spark, eng):
    """After a compaction, epoch=0 is the big bottom tier: further small
    epochs merge among THEMSELVES, never with the base."""
    compact_streamed_index(spark, eng.index_dir)
    for i, rows in enumerate(EPOCHS[:4]):
        shifted = [(d + 100 * (i + 1), t) for d, t in rows]
        append_docs(_df(spark, shifted), eng.index_dir)
    before = SearchEngine(spark, eng.index_dir).search("spark", k=30)

    merge_epochs_tiered(spark, eng.index_dir, max_segments=2)
    from searchengine_spark.index.build import read_manifest

    marker = [m for m in read_manifest(eng.index_dir)
              if m.get("kind") == "merge"][-1]
    assert 0 not in marker["epochs_folded"]
    dirs = _epoch_dirs(eng.index_dir)
    # budget counts STREAM epochs: base + (max_segments - 1 survivors +
    # 1 merged) = 3 dirs; the base tier is untouched
    assert "epoch=0" in dirs and len(dirs) == 3
    assert SearchEngine(spark, eng.index_dir).search("spark", k=30) == before


def test_cli_merge_command(spark, tmp_path, capsys):
    import json

    from searchengine_spark import cli

    idx = str(tmp_path / "cidx")
    for rows in EPOCHS:
        append_docs(_df(spark, rows), idx, n_buckets=2, range_bits=1)
    cli.main(["search", "--index", idx, "--query", "spark merge", "-k", "5"])
    before = json.loads(capsys.readouterr().out)["hits"]
    cli.main(["merge", "--index", idx, "--max-segments", "2"])
    out = json.loads(capsys.readouterr().out)
    assert out["segments_dir"] == "segments_m1" and out["n_docs"] == 11
    assert len(_epoch_dirs(idx)) == 2
    cli.main(["search", "--index", idx, "--query", "spark merge", "-k", "5"])
    assert json.loads(capsys.readouterr().out)["hits"] == before


def test_merge_reaches_fixed_point(spark, eng):
    """Candidates must coalesce through prior merge markers: a second
    maintenance call at the same budget is a NO-OP (stream_epoch manifest
    lines are never consumed, so without the coalescing every call past
    the budget re-merged the merged tier forever)."""
    from searchengine_spark.index.build import read_manifest

    meta1 = merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    n_markers = sum(
        1 for m in read_manifest(eng.index_dir) if m.get("kind") == "merge"
    )
    assert n_markers == 1
    meta2 = merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    assert meta2.segments_dir == meta1.segments_dir  # no new dir
    assert sum(
        1 for m in read_manifest(eng.index_dir) if m.get("kind") == "merge"
    ) == 1  # no new marker — true no-op

    # a NEW epoch past the budget folds incrementally (merged tier counts
    # as ONE candidate of summed size), and results stay correct
    append_docs(_df(spark, [(12, "spark fixpoint probe")]), eng.index_dir,
                n_buckets=2, range_bits=1, with_positions=True)
    meta3 = merge_epochs_tiered(spark, eng.index_dir, max_segments=3)
    assert meta3.segments_dir != meta1.segments_dir
    marker = [m for m in read_manifest(eng.index_dir)
              if m.get("kind") == "merge"][-1]
    # live tiers were {merged(3): 4 docs, 0: 4, 4: 3, 5: 1} → fold the two
    # smallest (epochs 4 and 5) down to 3 dirs
    assert marker["epochs_folded"] == [4, 5]
    e2 = SearchEngine(spark, eng.index_dir)
    assert {d for d, _ in e2.search("fixpoint", k=5)} == {12}
    assert {d for d, _ in e2.search_phrase("merge sort", k=10)} == {5}
