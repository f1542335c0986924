"""Index snapshot / restore (the Elasticsearch snapshot API analogue).

A snapshot copies every queryable artifact of an index — ``meta.json``,
``manifest.jsonl``, ``dictionary/``, ``segments/``, ``docstats/``, plus
the optional ``epochs/`` (streamed), ``tombstones/`` (deletes) and
``source/`` (doc store) trees — into ``<repo>/<name>/`` together with a
``snapshot.json`` integrity manifest (relative path, size, sha256 per
file). ``staged/`` is excluded: it is a rebuildable build intermediate.
Restore verifies the manifest hash-for-hash BEFORE writing anything, and
restores into a target directory (never in place over a live index — an
engine simply opens the restored dir).

Scale note: this is the CONTROL PLANE. The copy loop here is
driver-side file I/O, which is correct for the sandbox's local
filesystem; on a cluster the same manifest drives a distributed copy
(one task per file — the manifest IS the work list) against object
storage, and the verify step reads back ETags/checksums the same way.
Immutable segments make incremental snapshots trivial: a file whose
(path, size, sha256) already exists in the repo is skipped
(``incremental=True``), which is how Lucene/ES snapshots stay cheap.

Reference anchor: the reference persists its index with pickle dumps
(Part A/indexer.py); snapshots generalize that to versioned, verified,
restorable backups.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

_EXCLUDE_TOP = {"staged"}  # rebuildable intermediates
_MANIFEST = "snapshot.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _index_files(index_dir: str) -> list[str]:
    """Relative paths of every snapshot-worthy file (deterministic order)."""
    out: list[str] = []
    for root, dirs, files in os.walk(index_dir):
        rel_root = os.path.relpath(root, index_dir)
        if rel_root == ".":
            dirs[:] = [d for d in dirs if d not in _EXCLUDE_TOP]
        for f in files:
            if f.startswith(".") or f.endswith(".crc"):
                continue  # checksum side-files; integrity is our manifest
            rel = os.path.normpath(os.path.join(rel_root, f))
            out.append(rel if not rel.startswith("./") else rel[2:])
    return sorted(out)


def snapshot_index(
    index_dir: str,
    repo_dir: str,
    name: str,
    incremental: bool = True,
) -> dict:
    """Copy the index into ``repo_dir/name/`` with an integrity manifest.
    Refuses an existing snapshot name (snapshots are immutable). With
    ``incremental`` (default), files already present in OTHER snapshots
    of this repo with the same (size, sha256) are hard-linked instead of
    copied — immutable segments make most of a re-snapshot free."""
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        raise ValueError(f"not an index dir (no meta.json): {index_dir}")
    snap = os.path.join(repo_dir, name)
    if os.path.exists(snap):
        raise ValueError(f"snapshot already exists: {snap}")
    os.makedirs(snap)
    # content-addressed pool for incremental reuse
    pool = os.path.join(repo_dir, "_pool")
    os.makedirs(pool, exist_ok=True)
    entries = []
    copied = reused = 0
    t0 = time.time()
    for rel in _index_files(index_dir):
        src = os.path.join(index_dir, rel)
        digest = _sha256(src)
        size = os.path.getsize(src)
        dst = os.path.join(snap, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        blob = os.path.join(pool, digest)
        if incremental and os.path.exists(blob) and os.path.getsize(blob) == size:
            os.link(blob, dst)
            reused += 1
        else:
            shutil.copyfile(src, dst)
            if incremental:
                if not os.path.exists(blob):
                    os.link(dst, blob)
            copied += 1
        entries.append({"path": rel, "size": size, "sha256": digest})
    manifest = {
        "name": name,
        "created_unix": time.time(),
        "source": os.path.abspath(index_dir),
        "n_files": len(entries),
        "bytes": sum(e["size"] for e in entries),
        "files": entries,
    }
    tmp = os.path.join(snap, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(snap, _MANIFEST))
    return {
        "snapshot": snap,
        "n_files": len(entries),
        "bytes": manifest["bytes"],
        "copied": copied,
        "reused": reused,
        "sec": round(time.time() - t0, 3),
    }


def list_snapshots(repo_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo_dir):
        return out
    for name in sorted(os.listdir(repo_dir)):
        mpath = os.path.join(repo_dir, name, _MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            out.append(
                {
                    "name": name,
                    "n_files": m["n_files"],
                    "bytes": m["bytes"],
                    "created_unix": m["created_unix"],
                }
            )
    return out


def verify_snapshot(repo_dir: str, name: str) -> list[str]:
    """Return a list of integrity errors (empty = verified): missing
    files, size drift, and sha256 mismatches against the manifest."""
    snap = os.path.join(repo_dir, name)
    mpath = os.path.join(snap, _MANIFEST)
    if not os.path.exists(mpath):
        return [f"no manifest: {mpath}"]
    with open(mpath) as f:
        manifest = json.load(f)
    errors = []
    for e in manifest["files"]:
        p = os.path.join(snap, e["path"])
        if not os.path.exists(p):
            errors.append(f"missing: {e['path']}")
        elif os.path.getsize(p) != e["size"]:
            errors.append(f"size drift: {e['path']}")
        elif _sha256(p) != e["sha256"]:
            errors.append(f"sha256 mismatch: {e['path']}")
    return errors


def restore_index(
    repo_dir: str, name: str, target_dir: str, overwrite: bool = False
) -> dict:
    """Verify the snapshot, then materialize it at ``target_dir``. The
    restore is staged into ``target_dir + '.restoring'`` and renamed into
    place, so a crash mid-restore never leaves a half-index at the
    target path."""
    errors = verify_snapshot(repo_dir, name)
    if errors:
        raise ValueError(f"snapshot {name} failed verification: {errors[:3]}")
    if os.path.exists(target_dir) and not overwrite:
        raise ValueError(f"target exists (pass overwrite=True): {target_dir}")
    snap = os.path.join(repo_dir, name)
    staging = target_dir.rstrip("/") + ".restoring"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    with open(os.path.join(snap, _MANIFEST)) as f:
        manifest = json.load(f)
    # STAGE FIRST, remove the live target LAST: deleting before the copy
    # meant a failed copy (disk full, crash) had already destroyed the
    # previous working index — the crash-safety the docstring promises
    for e in manifest["files"]:
        src = os.path.join(snap, e["path"])
        dst = os.path.join(staging, e["path"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
    if os.path.exists(target_dir):
        old = target_dir.rstrip("/") + ".replaced"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(target_dir, old)  # aside, not gone — until the swap lands
        os.rename(staging, target_dir)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, target_dir)
    return {
        "restored": target_dir,
        "n_files": manifest["n_files"],
        "bytes": manifest["bytes"],
    }
