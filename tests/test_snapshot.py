"""Index snapshot/restore: restored indexes answer queries identically to
the snapshot-time index (even after the source mutated), verification
catches corruption, incremental snapshots reuse unchanged segments, and
restore refuses unverified or occupied targets."""

from __future__ import annotations

import os

import pytest

from searchengine_spark import snapshot as snap
from searchengine_spark.corpus import corpus_df
from searchengine_spark.query.engine import SearchEngine

QUERY = "spark stream join"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("snapshots")
    idx = str(base / "idx")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(corpus_df(spark, 250), range_bits=2, n_buckets=4)
    return base, idx, eng


def test_snapshot_restore_roundtrip_preserves_results(spark, built):
    base, idx, eng = built
    before = eng.search(QUERY, k=10)
    repo = str(base / "repo")
    info = snap.snapshot_index(idx, repo, "s1")
    assert info["n_files"] > 0 and snap.verify_snapshot(repo, "s1") == []

    # mutate the live index AFTER the snapshot
    eng.delete_docs([d for d, _ in before[:3]])
    mutated = eng.search(QUERY, k=10)
    assert mutated != before

    restored_dir = str(base / "restored")
    snap.restore_index(repo, "s1", restored_dir)
    r_eng = SearchEngine(spark, restored_dir)
    assert r_eng.search(QUERY, k=10) == before  # snapshot-time results


def test_verify_catches_corruption(spark, built, tmp_path):
    base, idx, _ = built
    repo = str(tmp_path / "repo")
    snap.snapshot_index(idx, repo, "s1")
    # flip bytes in one stored segment file
    target = None
    for root, _dirs, files in os.walk(os.path.join(repo, "s1", "segments")):
        for f in files:
            if f.endswith(".parquet"):
                target = os.path.join(root, f)
                break
        if target:
            break
    assert target is not None
    with open(target, "r+b") as f:
        f.seek(10)
        f.write(b"\xff\xff\xff")
    errors = snap.verify_snapshot(repo, "s1")
    assert errors and "sha256" in errors[0]
    with pytest.raises(ValueError, match="verification"):
        snap.restore_index(repo, "s1", str(tmp_path / "never"))


def test_incremental_snapshot_reuses_unchanged_files(spark, built, tmp_path):
    _base, idx, _ = built
    repo = str(tmp_path / "repo")
    first = snap.snapshot_index(idx, repo, "s1")
    second = snap.snapshot_index(idx, repo, "s2")
    # within s1, identical-content files (e.g. empty _SUCCESS markers)
    # already dedupe against the pool; everything else is a fresh copy
    assert first["copied"] >= 1
    assert first["copied"] + first["reused"] == first["n_files"]
    assert second["reused"] == second["n_files"]  # nothing changed
    assert snap.verify_snapshot(repo, "s2") == []
    assert [s["name"] for s in snap.list_snapshots(repo)] == ["s1", "s2"]


def test_snapshot_name_immutable_and_target_guard(spark, built, tmp_path):
    _base, idx, _ = built
    repo = str(tmp_path / "repo")
    snap.snapshot_index(idx, repo, "s1")
    with pytest.raises(ValueError, match="already exists"):
        snap.snapshot_index(idx, repo, "s1")
    tgt = str(tmp_path / "occupied")
    os.makedirs(tgt)
    with pytest.raises(ValueError, match="target exists"):
        snap.restore_index(repo, "s1", tgt)
    snap.restore_index(repo, "s1", tgt, overwrite=True)
    assert os.path.exists(os.path.join(tgt, "meta.json"))


def test_snapshot_refuses_non_index_dir(tmp_path):
    with pytest.raises(ValueError, match="meta.json"):
        snap.snapshot_index(str(tmp_path), str(tmp_path / "repo"), "s1")
