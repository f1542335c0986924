"""Structured-Streaming ingestion for the index pipeline.

The reference has NO streaming (SURVEY.md §2.9 — its only incremental
behavior is the 100k-doc batch spill, ``Part A/indexer.py:15,47-51``). A
100 TB training-data pipeline, however, ingests continuously, so this module
adds the Spark-native incremental path on top of the batch builder:

  * ``stream_corpus``          — file-source ``readStream`` over a growing
                                 directory of corpus parquet drops.
  * ``incremental_index``      — ``writeStream.foreachBatch``: every
                                 micro-batch runs the SAME salted
                                 encode-to-segments job as the batch builder
                                 and appends to the index with per-batch
                                 manifest lineage (epoch id → resumable,
                                 exactly-once per checkpoint).
  * ``streaming_term_counts``  — continuously-maintained (term, df, cf)
                                 aggregate in update mode (complete agg state
                                 in the state store; dictionary-size state —
                                 small).
  * ``streaming_window_stats`` — event-time windowed ingest stats with a
                                 watermark for late data: docs/sec, avg doc
                                 length per window. The ops dashboard feed.

Scale notes: foreachBatch inherits every batch-path property (salting,
partitioned segment writes, manifests), so stream ingestion shares one code
path with backfill. maxFilesPerTrigger bounds micro-batch size; the
checkpoint dir carries the source offsets → kill/restart resumes without
reprocessing (same guarantee family as the batch builder's manifests).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..postings import term_frequencies, term_positions


def stream_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source readStream over a directory receiving corpus parquet
    drops. Schema must be supplied (streaming sources cannot infer)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _manifest_state(index_dir: str) -> tuple[list[dict], list[dict], dict | None]:
    """(all stream_epoch lines, stream_epoch lines since the last
    compaction marker, last compaction marker) — the crash-consistent
    view of the index state."""
    from ..index.build import read_manifest

    full = read_manifest(index_dir)
    last_c = -1
    for i, m in enumerate(full):
        if m.get("kind") == "compaction":
            last_c = i
    epochs_all = [m for m in full if m.get("kind") == "stream_epoch"]
    epochs_since = [
        m for m in full[last_c + 1 :] if m.get("kind") == "stream_epoch"
    ]
    return epochs_all, epochs_since, (full[last_c] if last_c >= 0 else None)


def _carry_source_fields(index_dir: str, meta):
    """Epoch commits and manifest recovery build a FRESH IndexMeta (the
    manifest doesn't record doc-store fields) — copy ``has_source`` /
    ``source_id_col`` / ``source_text_col`` forward from the existing
    meta.json so an epoch append never silently detaches the doc store."""
    from ..index.build import IndexMeta

    path = os.path.join(index_dir, "meta.json")
    if meta is None or not os.path.exists(path):
        return meta
    old = IndexMeta.load(index_dir)
    meta.has_source = old.has_source
    meta.source_id_col = old.source_id_col
    meta.source_text_col = old.source_text_col
    return meta


def _meta_from_manifest(
    epochs_all: list[dict],
    epochs_since: list[dict],
    compaction: dict | None,
    range_bits: int,
    n_buckets: int,
    with_positions: bool,
    segdir: str | None = None,
):
    """Post-state of the last committed epoch, derived purely from the
    manifest — the recovery source of truth. None for pre-upgrade
    manifests without running totals. ``segdir``: the last
    segment-dir-changing commit's directory (``_last_segdir``) — a tiered
    MERGE moves the segments dir without being a compaction, so the
    compaction marker alone can be stale."""
    from .. import BM25_B, BM25_K1
    from ..index.build import IndexMeta
    from ..index.codec import BLOCK_SIZE

    if (
        compaction is not None
        and not epochs_since
        and "n_docs_total" in compaction
    ):
        # a tombstone-applying compaction is the LATEST commit: it
        # shrank the corpus and rebuilt the dictionary, so the next
        # epoch must resume from ITS totals, not the last epoch's
        n = int(compaction["n_docs_total"])
        tot = int(compaction["total_len_total"])
        return IndexMeta(
            n_docs=n,
            avgdl=(tot / n) if n else 1.0,
            k1=BM25_K1,
            b=BM25_B,
            range_bits=range_bits,
            n_buckets=n_buckets,
            block_size=BLOCK_SIZE,
            fingerprint=f"stream-compact-{n}",
            dictionary_dir=compaction["dictionary_dir"],
            stream_epochs=0,
            total_len=tot,
            segments_dir=segdir or compaction.get("segments_dir", "segments"),
            has_positions=bool(
                compaction.get("has_positions", with_positions)
            ),
            analyzer=compaction.get("analyzer", "standard"),
        )
    if not epochs_all or "n_docs_total" not in epochs_all[-1]:
        return None
    last = epochs_all[-1]
    n = int(last["n_docs_total"])
    tot = int(last["total_len_total"])
    return IndexMeta(
        n_docs=n,
        avgdl=tot / n,
        k1=BM25_K1,
        b=BM25_B,
        range_bits=range_bits,
        n_buckets=n_buckets,
        block_size=BLOCK_SIZE,
        fingerprint=f"stream-{int(last['epoch'])}-{n}",
        dictionary_dir=last["dictionary_dir"],
        stream_epochs=len(epochs_since),
        total_len=tot,
        segments_dir=segdir or (compaction or {}).get("segments_dir", "segments"),
        # recover the index's ACTUAL positional state from the manifest,
        # not this run's flag (pre-upgrade lines lack the field)
        has_positions=bool(last.get("has_positions", with_positions)),
        analyzer=last.get("analyzer", "standard"),
    )


def _last_segdir(index_dir: str) -> str | None:
    """segments_dir of the LAST segment-dir-changing commit (compaction or
    tiered merge marker), or None if neither has ever committed. The race
    guard in ``_commit_epoch`` compares this across the encode window —
    either maintenance kind swapping the directory mid-encode must abort
    the epoch commit."""
    from ..index.build import read_manifest

    out = None
    for m in read_manifest(index_dir):
        if m.get("kind") in ("compaction", "merge"):
            out = m.get("segments_dir", "segments")
    return out


# A tombstone table at or below this many raw rows folds via the fast
# zero-shuffle closure (arrays shipped with the decode kernel, ~8-16 B/row);
# above it compaction switches to the JOIN fold so the driver never
# materializes the set (a single delete_by_query can tombstone billions).
FOLD_CLOSURE_BOUND = 2_000_000


class MaintenanceInProgress(RuntimeError):
    """Another process holds this index's maintenance lock (a compaction or
    tiered merge is in flight)."""


def _maintenance_lock_acquire(
    index_dir: str, stale_sec: float = 3600.0
) -> tuple[str, str]:
    """Best-effort single-host mutual exclusion for segment-swapping
    maintenance (compact / tiered merge): two concurrent folds would both
    compute the same next segments_c{K} name, overwrite each other's dir,
    and double-consume tombstone files. O_EXCL lock file under the index
    dir; a lock older than ``stale_sec`` is presumed crashed and stolen
    once. On a multi-host cluster an external coordinator owns this
    decision — this file maps to that slot. Returns ``(lock_path, token)``
    where ``token`` is a unique holder id written into the file — release
    via ``_maintenance_lock_release``, which only removes the file while
    it still carries this token (a fold running past ``stale_sec`` whose
    lock was stolen must NOT delete the thief's lock, or a third process
    would be admitted into the same segments_c{K} collision the lock
    exists to prevent). Raises MaintenanceInProgress when held."""
    import uuid

    lock = os.path.join(index_dir, ".maintenance.lock")
    token = f"{os.getpid()}:{uuid.uuid4().hex}"
    stole = False
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, f"{token} {time.time()}\n".encode())
            finally:
                os.close(fd)
            return lock, token
        except FileExistsError:
            try:
                age = time.time() - os.stat(lock).st_mtime
            except OSError:
                continue  # holder just released — retry the create
            if age > stale_sec and not stole:
                stole = True
                try:
                    os.remove(lock)
                except OSError:
                    pass
                continue
            raise MaintenanceInProgress(
                f"maintenance lock held on {index_dir} "
                f"(age {age:.0f}s; stale after {stale_sec:.0f}s)"
            )


def _maintenance_lock_release(lock: str, token: str) -> None:
    """Remove the lock file only while it still belongs to ``token``. If a
    long fold overran ``stale_sec`` and another process stole the lock,
    the file now carries the thief's token and must be left in place."""
    try:
        with open(lock) as fh:
            holder = fh.read().split(" ", 1)[0]
    except OSError:
        return  # already stolen-and-released, or never created
    if holder != token:
        return  # stolen by a live process — its lock, not ours
    try:
        os.remove(lock)
    except OSError:
        pass


class _LockHeartbeat:
    """Daemon thread that touches the lock's mtime every ``interval`` sec
    while the holder's fold runs, so a LIVE long fold (multi-hour join-fold
    over billions of tombstone rows) never looks stale to a second process
    — staleness then only ever means a genuinely crashed holder. Touching
    stops the moment the file no longer carries our token (we were stolen
    after a real stall, e.g. a SIGSTOP'd process resuming)."""

    def __init__(self, lock: str, token: str, interval: float = 300.0):
        import threading

        self._lock, self._token = lock, token
        self._stop = threading.Event()
        self._interval = interval
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                with open(self._lock) as fh:
                    if fh.read().split(" ", 1)[0] != self._token:
                        return  # stolen — stop refreshing a thief's lock
                os.utime(self._lock, None)
            except OSError:
                return  # released/removed — nothing left to keep fresh

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)


def _join_fold_postings(spark, blocks, tomb_files: list[str], has_pos: bool):
    """Decode ``blocks`` and apply a LARGE tombstone set distributed: plain
    deletes as an anti-join, update watermarks as a per-doc max + epoch
    filter (NULL epoch counts as covered — `_alive_in_epoch`'s None-epoch
    rule). The tombstone-derived frames are PERSISTED (they feed two joins
    plus the n_dead counts — unpersisted, every consumer would rescan the
    multi-billion-row table). Returns ``(postings, n_dead, release)``;
    call ``release()`` after the consuming writes have executed.
    Shared by ``compact_streamed_index`` and ``merge_epochs_tiered`` so the
    drop rules cannot diverge between them."""
    tdf = spark.read.schema("doc_id long, wm long").parquet(*tomb_files)
    plain_df = (
        tdf.filter(F.col("wm").isNull()).select("doc_id").distinct().persist()
    )
    upd_df = (
        tdf.filter(F.col("wm").isNotNull())
        .groupBy("doc_id")
        .agg(F.max("wm").alias("wm"))  # latest update wins
        .join(plain_df, "doc_id", "left_anti")  # a delete overrides
        .persist()
    )
    n_dead = plain_df.count() + upd_df.count()
    decoded = blocks.mapInPandas(
        _fold_rows_fn(has_pos, None, None, emit_epoch=True),
        _fold_schema(has_pos, with_epoch=True),
    )
    postings = (
        decoded.join(plain_df, "doc_id", "left_anti")
        .join(upd_df, "doc_id", "left")
        .filter(
            F.col("wm").isNull()
            | (F.col("epoch").isNotNull() & (F.col("epoch") > F.col("wm")))
        )
        .drop("wm", "epoch")
    )

    def release() -> None:
        plain_df.unpersist()
        upd_df.unpersist()

    return postings, n_dead, release


def _tombstone_files(index_dir: str) -> list[str]:
    tomb_dir = os.path.join(index_dir, "tombstones")
    return (
        sorted(
            os.path.join(tomb_dir, n)
            for n in os.listdir(tomb_dir)
            if n.endswith(".parquet")
        )
        if os.path.isdir(tomb_dir)
        else []
    )


def _tombstone_row_total(tomb_files: list[str]) -> int:
    """Raw row count from parquet FOOTERS only (driver-local metadata read,
    no Spark job) — decides closure fold vs join fold."""
    import pyarrow.parquet as pq

    total = 0
    for p in tomb_files:
        try:
            total += pq.ParquetFile(p).metadata.num_rows
        except OSError:
            continue
    return total


def _load_tombstone_arrays(spark, index_dir: str, tomb_files=None):
    """(tomb, upd, upd_wm, tomb_files): sorted-unique u64 plain-delete ids,
    last-wins update ids + parallel watermarks (updates already deleted are
    dropped), and the tombstone parquet files read — shared by compaction
    and tiered merge."""
    import numpy as np

    if tomb_files is None:
        tomb_files = _tombstone_files(index_dir)
    tomb, upd, upd_wm = None, None, None
    if tomb_files:
        tpdf = (
            spark.read.schema("doc_id long, wm long")
            .parquet(*tomb_files)
            .toPandas()
        )
        ids = tpdf["doc_id"].to_numpy(dtype="int64").view("uint64")
        wms = tpdf["wm"].to_numpy(dtype="float64")  # NaN = plain delete
        t_arr = np.unique(ids[np.isnan(wms)])
        tomb = t_arr if len(t_arr) else None
        um = ~np.isnan(wms)
        if um.any():
            uid, uw = ids[um], wms[um].astype(np.int64)
            order = np.lexsort((uw, uid))
            uid, uw = uid[order], uw[order]
            last = np.concatenate((uid[1:] != uid[:-1], [True]))
            upd, upd_wm = uid[last], uw[last]
            if tomb is not None:
                keep = ~np.isin(upd, tomb)
                upd, upd_wm = upd[keep], upd_wm[keep]
            if len(upd) == 0:
                upd, upd_wm = None, None
    return tomb, upd, upd_wm, tomb_files


def _fold_schema(has_pos: bool, with_epoch: bool = False) -> str:
    schema = "bucket int, doc_range int, term string, doc_id long, tf long, doc_len long"
    if has_pos:
        schema += ", positions array<long>"
    if with_epoch:
        schema += ", epoch long"
    return schema


def _fold_rows_fn(has_pos: bool, tomb, drop_mask, emit_epoch: bool = False):
    """mapInPandas kernel: decode segment blocks back to posting rows,
    physically dropping postings dead under ``tomb`` (plain deletes) and
    ``drop_mask`` (update watermarks, evaluated at each block's ORIGINAL
    epoch — superseded versions die, current versions survive). The decode
    is numpy repeat/concatenate; postings never collect to the driver.
    Shared by ``compact_streamed_index`` (all epochs) and
    ``merge_epochs_tiered`` (a folded subset).

    ``emit_epoch=True`` is the JOIN-fold variant (tombstone sets too big
    for a closure): no dropping here — every decoded row carries its
    block's epoch (NULL on batch layouts) so a downstream anti-join/
    watermark filter can apply the tombstones distributed."""

    def to_rows(batches):
        import numpy as np
        import pandas as pd

        from ..index.codec import decode_block, decode_block_positions
        from ..query.wand import _alive_in_epoch, _not_excluded

        for pdf in batches:
            if not len(pdf):
                continue
            docs_l, tfs_l, dls_l = [], [], []
            pos_rows: list = []
            n_kept = np.empty(len(pdf), dtype=np.int64)
            for i, r in enumerate(pdf.itertuples(index=False)):
                d, t, dl = decode_block(
                    r.first_doc, r.n_docs, r.doc_bytes, r.tf_bytes, r.dl_bytes
                )
                keep = _not_excluded(d, tomb)
                e = getattr(r, "epoch", None)
                alive = _alive_in_epoch(
                    d, None if e is None else int(e), drop_mask
                )
                if alive is not None:
                    keep = alive if keep is None else (keep & alive)
                if has_pos:
                    flat, cumtf = decode_block_positions(t, r.pos_bytes)
                    # per-posting position arrays (row j owns flat[cumtf[j]:
                    # cumtf[j+1]]) — np.split keeps this a slice, not a copy
                    parts = np.split(flat.astype(np.int64), cumtf[1:-1])
                    pos_rows.extend(
                        parts
                        if keep is None
                        else [p for p, kk in zip(parts, keep) if kk]
                    )
                if keep is not None:
                    d, t, dl = d[keep], t[keep], dl[keep]
                n_kept[i] = len(d)
                docs_l.append(d.view(np.int64))
                tfs_l.append(t.astype(np.int64))
                dls_l.append(dl.astype(np.int64))
            out = pd.DataFrame(
                {
                    "bucket": np.repeat(
                        pdf["bucket"].to_numpy(dtype=np.int32), n_kept
                    ),
                    "doc_range": np.repeat(
                        pdf["doc_range"].to_numpy(dtype=np.int32), n_kept
                    ),
                    "term": np.repeat(pdf["term"].to_numpy(), n_kept),
                    "doc_id": np.concatenate(docs_l),
                    "tf": np.concatenate(tfs_l),
                    "doc_len": np.concatenate(dls_l),
                }
            )
            if has_pos:
                out["positions"] = pos_rows
            if emit_epoch:
                if "epoch" in pdf.columns:
                    out["epoch"] = pd.array(
                        np.repeat(
                            pdf["epoch"].to_numpy(dtype=np.int64), n_kept
                        ),
                        dtype="Int64",
                    )
                else:  # batch layout: no epoch partition → NULL epoch
                    out["epoch"] = pd.array([pd.NA] * len(out), dtype="Int64")
            yield out

    return to_rows


def _commit_epoch(
    batch_df: DataFrame,
    index_dir: str,
    epoch_id: int,
    stream_id: str,
    *,
    id_col: str,
    text_col: str,
    n_buckets: int,
    range_bits: int,
    with_positions: bool,
    analyzer: str = "standard",
) -> None:
    """Encode + commit ONE epoch of documents into the index — the shared
    core of the streaming foreachBatch path and the batch ``append_docs``
    path. Commit protocol: everything before the manifest append is an
    idempotent overwrite; the manifest line (with post-state totals) is the
    commit point; the atomic meta swap follows (a crash in between is
    repaired from the manifest by the replay guard / append allocator)."""
    from .. import BM25_B, BM25_K1
    from ..index.build import (
        BLOCK_SCHEMA,
        IndexMeta,
        _encode_group_fn,
        _manifest_append,
        write_meta_atomic,
    )
    from ..index.codec import BLOCK_SIZE

    spark = batch_df.sparkSession
    epochs_all, epochs_since, compaction = _manifest_state(index_dir)
    segdir0 = _last_segdir(index_dir)
    meta_path = os.path.join(index_dir, "meta.json")
    if epochs_all and "has_positions" in epochs_all[-1] and bool(
        epochs_all[-1]["has_positions"]
    ) != with_positions:
        # a restart flipping with_positions would mix positional and
        # position-free epochs in one index: phrase/compaction would
        # crash on pos_bytes=None blocks (False→True) or silently drop
        # the positional stream at the next compaction (True→False)
        raise ValueError(
            f"index at {index_dir} was streamed with has_positions="
            f"{epochs_all[-1]['has_positions']}; restart with the same "
            f"with_positions flag (got {with_positions})"
        )
    if epochs_all and epochs_all[-1].get("analyzer", "standard") != analyzer:
        raise ValueError(
            f"index at {index_dir} was built with analyzer="
            f"{epochs_all[-1].get('analyzer', 'standard')!r}; appending with "
            f"{analyzer!r} would mix token vocabularies"
        )
    from ..tokenizer import analyze_text_expr

    batch_df = batch_df.withColumn(
        text_col, analyze_text_expr(F.col(text_col), analyzer)
    )
    tf_source = term_positions if with_positions else term_frequencies
    # persist: the stats collect, the segment write, and the dictionary
    # write each consume this frame — unpersisted, every micro-batch would
    # re-tokenize and re-aggregate the batch three times
    tf = tf_source(batch_df, id_col, text_col, use_arrow_udf=False).persist()
    stats = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    agg = stats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("tot")
    ).collect()[0]
    if not agg["n"]:
        tf.unpersist()
        return
    # previous post-state comes from the MANIFEST (crash-consistent),
    # not from meta.json (which may lag by one epoch after a crash);
    # pre-upgrade manifests without totals fall back to meta
    prev = _meta_from_manifest(
        epochs_all, epochs_since, compaction, range_bits, n_buckets,
        with_positions, segdir=_last_segdir(index_dir),
    )
    if prev is None and os.path.exists(meta_path):
        prev = IndexMeta.load(index_dir)
    if prev is not None:
        n_docs = prev.n_docs + int(agg["n"])
        total_len = prev.total_len + int(agg["tot"])
        stream_epochs = prev.stream_epochs + 1
    else:
        n_docs = int(agg["n"])
        total_len = int(agg["tot"])
        stream_epochs = 1
    avgdl = total_len / n_docs

    staged = (
        tf.join(stats, "doc_id")
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        .withColumn(
            "doc_range",
            F.shiftrightunsigned(F.col("doc_id"), 64 - range_bits).cast("int"),
        )
    )
    encode = _encode_group_fn(BM25_K1, BM25_B, avgdl, BLOCK_SIZE)
    enc = staged.groupBy("bucket", "doc_range").applyInPandas(encode, BLOCK_SCHEMA)
    seg_rel = prev.segments_dir if prev is not None else "segments"
    out = os.path.join(index_dir, seg_rel, f"epoch={epoch_id}")
    enc.write.mode("overwrite").partitionBy("bucket").parquet(out)
    n_blocks = spark.read.parquet(out).count()

    # ---- merge dictionary across epochs -------------------------------
    batch_dict = staged.groupBy("term").agg(
        F.first("bucket").alias("bucket"),
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.max("tf").alias("max_tf"),
        F.min("doc_len").alias("min_dl"),
    )
    cols = ["term", "bucket", "df", "cf", "max_tf", "min_dl"]
    if prev is not None:
        old = spark.read.parquet(os.path.join(index_dir, prev.dictionary_dir))
        merged = (
            old.select(*cols)
            .unionByName(batch_dict.select(*cols))
            .groupBy("term")
            .agg(
                F.first("bucket").alias("bucket"),
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.max("max_tf").alias("max_tf"),
                F.min("min_dl").alias("min_dl"),
            )
        )
    else:
        merged = batch_dict
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    u_robust = (F.col("max_tf") * (BM25_K1 + 1.0)) / (
        F.col("max_tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("min_dl") / avgdl)
    )
    dict_dir = f"dictionary_e{int(epoch_id)}"
    merged.withColumn("idf", idf).withColumn("max_u", u_robust).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, dict_dir))
    tf.unpersist()  # dictionary write was the last tf consumer

    # ---- COMMIT: manifest line (with post-state totals) first, then the
    # atomic meta swap. Everything before the append is idempotent
    # (overwrite writes); a crash before it → full redo with identical
    # inputs; a crash after it → the replay guard repairs meta from this
    # line. This is what makes "the merge must not run twice" true.
    #
    # Maintenance race guard: seg_rel/prev came from the batch-START
    # manifest snapshot. If a concurrent compact_streamed_index OR
    # merge_epochs_tiered committed since, this epoch's segments sit in
    # the SUPERSEDED dir and its dictionary merge misses the fold —
    # committing would lose the epoch when retention deletes that dir.
    # Abort pre-commit: the stream fails, nothing was committed, and the
    # restarted query replays the batch against the post-maintenance state.
    if _last_segdir(index_dir) != segdir0:
        raise RuntimeError(
            "a compaction or tiered merge committed while this epoch was "
            "encoding; restart the stream (checkpoint replays the batch "
            "against the post-maintenance index)"
        )
    _manifest_append(
        index_dir,
        {
            "kind": "stream_epoch",
            "bucket": None,
            "epoch": int(epoch_id),
            "n_docs": int(agg["n"]),
            "n_blocks": int(n_blocks),
            "dictionary_dir": dict_dir,
            "n_docs_total": n_docs,
            "total_len_total": total_len,
            "has_positions": with_positions,
            "analyzer": analyzer,
            "stream_id": stream_id,
            "ts": time.time(),
        },
    )
    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        k1=BM25_K1,
        b=BM25_B,
        range_bits=range_bits,
        n_buckets=n_buckets,
        block_size=BLOCK_SIZE,
        fingerprint=f"stream-{int(epoch_id)}-{n_docs}",
        dictionary_dir=dict_dir,
        stream_epochs=stream_epochs,
        total_len=total_len,
        segments_dir=seg_rel,
        has_positions=with_positions,
        analyzer=analyzer,
    )
    write_meta_atomic(index_dir, _carry_source_fields(index_dir, meta))


def append_docs(
    corpus_df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
    range_bits: int = 3,
    with_positions: bool = False,
    analyzer: str = "standard",
) -> int:
    """Batch-append documents to an epoch-layout index (Lucene
    ``addDocuments`` analogue): one ``_commit_epoch`` call with a freshly
    allocated epoch id (max committed + 1) — the exact commit protocol the
    streaming path uses (manifest line = commit point, atomic meta swap,
    merged dictionary), so the result is indistinguishable from one more
    streamed micro-batch and ``SearchEngine`` picks it up via the meta
    fingerprint. On an empty/nonexistent index this CREATES the index
    (epoch 0).

    Doc_ids must not repeat across epochs (same ingest invariant as the
    streaming path) — for replacing an existing doc use
    ``SearchEngine.update_docs``, which pairs an append with an
    epoch-watermarked tombstone.

    Not for use concurrently with a LIVE streaming query on the same index:
    the stream's checkpoint-assigned epoch ids could collide with an
    allocated one, which the commit guard refuses loudly (availableNow
    drain-then-append sequencing is fine). Returns the committed epoch id."""
    os.makedirs(index_dir, exist_ok=True)
    epochs_all, _, compaction = _manifest_state(index_dir)
    if (
        not epochs_all
        and compaction is None
        and os.path.exists(os.path.join(index_dir, "meta.json"))
    ):
        # a batch build lays segments out as bucket=<b> directly; dropping
        # epoch=<id> dirs next to them would corrupt partition discovery
        raise ValueError(
            f"index at {index_dir} is a batch build with no epoch layout; "
            "append/update need an epoch-layout index — build it via "
            "incremental_index/append_docs from the start, or run "
            "compact_streamed_index once to convert"
        )
    next_id = 0
    if epochs_all:
        next_id = max(int(e["epoch"]) for e in epochs_all) + 1
    if compaction is not None:
        # compacted layout keeps its fold under epoch=0
        next_id = max(next_id, 1)
    if epochs_all or compaction is not None:
        # geometry is pinned by the existing index, not the caller
        from ..index.build import IndexMeta

        meta = IndexMeta.load(index_dir)
        n_buckets, range_bits = meta.n_buckets, meta.range_bits
        with_positions = meta.has_positions
        analyzer = meta.analyzer
    _commit_epoch(
        corpus_df, index_dir, next_id, "batch-append",
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        range_bits=range_bits, with_positions=with_positions,
        analyzer=analyzer,
    )
    return next_id


def incremental_index(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
    range_bits: int = 3,
    await_termination: bool = True,
    with_positions: bool = False,
    analyzer: str = "standard",
):
    """Continuously append a QUERYABLE index: each micro-batch encodes its
    segments under ``segments/epoch=<id>`` AND merges the index-level state —
    dictionary (df/cf/max_tf/min_dl summed/maxed/minned across epochs, idf
    recomputed under the new corpus size) and meta.json (running n_docs and
    exact-integer total_len → running avgdl) — so ``SearchEngine`` answers
    over everything ingested so far, rank-identical to a batch build of the
    union (tests/test_streaming.py). The merged dictionary is written to a
    fresh ``dictionary_e<epoch>`` dir and swapped in via the meta.json
    pointer (readers never see a half-written dictionary); the engine's
    meta-fingerprint check picks the new epoch up automatically.

    Correctness notes:
      * segments are encoded under the epoch's running avgdl; stored block
        max_u is therefore stale for older epochs — the engine switches to
        the avgdl-robust bound u(max_tf, min_dl, current avgdl) when
        ``meta.stream_epochs > 0`` (engine.py), so pruning stays exact.
      * BM25 constants come from the package-level BM25_K1/BM25_B — the same
        pair every epoch and the batch builder use.
      * foreachBatch is at-least-once: a replayed epoch is detected in the
        manifest and skipped wholesale (segment overwrite was already
        idempotent; the manifest/meta/dictionary merge must not run twice).
      * doc_ids are assumed append-only unique across epochs (dedup upstream
        with streaming.dedup) — df/total_len merges count each doc once.
      * ``with_positions=True`` stages per-posting token positions and the
        epoch encoder emits pos_bytes (same kernel as the positional batch
        build) — ``search_phrase`` works over streamed indexes, and
        compaction preserves the positional stream.

    Trigger(availableNow=True) drains what exists then stops — the test and
    backfill mode; pass await_termination=False for a live continuous query.
    """
    from ..index.build import IndexMeta, write_meta_atomic

    os.makedirs(index_dir, exist_ok=True)

    import hashlib

    stream_id = hashlib.md5(
        os.path.realpath(checkpoint_dir).encode()
    ).hexdigest()[:12]

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        epochs_all, epochs_since, compaction = _manifest_state(index_dir)
        meta_path = os.path.join(index_dir, "meta.json")
        hit = [e for e in epochs_all if e["epoch"] == int(epoch_id)]
        if hit:
            if hit[-1].get("stream_id", stream_id) != stream_id:
                # a FRESH checkpoint restarts epoch ids at 0; treating the
                # collision as a replay would silently DROP this batch's
                # docs (observed: new drops vanish when a new checkpoint is
                # pointed at an old index). Refuse loudly instead.
                raise ValueError(
                    f"epoch {int(epoch_id)} already committed to "
                    f"{index_dir} by a different checkpoint "
                    f"(stream {hit[-1]['stream_id']}); reuse the original "
                    "checkpoint dir, or start a fresh index"
                )
            # at-least-once replay — the manifest line is the COMMIT POINT.
            # A crash between that append and the meta swap leaves meta one
            # epoch behind: repair it from the manifest (idempotent).
            recovered = _meta_from_manifest(
                epochs_all, epochs_since, compaction,
                range_bits, n_buckets, with_positions,
                segdir=_last_segdir(index_dir),
            )
            stale = (not os.path.exists(meta_path)) or (
                IndexMeta.load(index_dir).stream_epochs != len(epochs_since)
            )
            if stale and recovered is not None:
                write_meta_atomic(
                    index_dir, _carry_source_fields(index_dir, recovered)
                )
            return
        _commit_epoch(
            batch_df, index_dir, int(epoch_id), stream_id,
            id_col=id_col, text_col=text_col, n_buckets=n_buckets,
            range_bits=range_bits, with_positions=with_positions,
            analyzer=analyzer,
        )

    q = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def compact_streamed_index(spark: SparkSession, index_dir: str) -> "IndexMeta":
    """Serialized entry point: acquires the per-index maintenance lock
    (``MaintenanceInProgress`` if a concurrent compact/merge holds it —
    two folds racing would collide on the next versioned segments dir and
    double-consume tombstones), then runs the fold below."""
    lock, token = _maintenance_lock_acquire(index_dir)
    hb = _LockHeartbeat(lock, token)
    try:
        return _compact_streamed_index_impl(spark, index_dir)
    finally:
        hb.stop()
        _maintenance_lock_release(lock, token)


def _compact_streamed_index_impl(
    spark: SparkSession, index_dir: str
) -> "IndexMeta":
    """Fold all streamed epochs into the canonical batch segment layout.

    High epoch counts fragment posting lists (one short block run per term
    per epoch) and force the looser avgdl-robust pruning bound. Compaction
    decodes every epoch's blocks back to posting rows executor-side
    (mapInPandas — postings never collect to the driver; the decode kernel
    is numpy repeat/concatenate, no per-posting Python), re-encodes them
    with the standard salted group kernel under the CURRENT meta avgdl, and
    swaps the result in. After the swap ``stream_epochs`` is 0: the engine
    reverts to the tight stored max_u bound (valid again — every block is
    now encoded under meta.avgdl). Further streamed epochs keep appending on
    top (the first one flips the engine back to robust bounds, which remain
    valid because compacted blocks carry max_tf/min_dl too). Assumes the
    ingest invariant (append-only unique doc_ids). A positional streamed
    index (``with_positions=True`` ingest) keeps its positional stream —
    pos_bytes are decoded and re-encoded alongside tf/dl.

    Swap protocol (reader-safe + crash-safe): the compacted segments are
    written to a fresh VERSIONED dir ``segments_c<K>``; the manifest
    compaction marker (commit point) then the atomic meta.json swap flip
    ``meta.segments_dir`` to it. The live segments dir is never renamed, so
    a crash at ANY point leaves a readable index (pre-commit: old state;
    post-commit: new state — the old rename protocol had a window with NO
    segments dir, and a concurrent reader could catch a half-swapped
    layout). An engine holding the old handle keeps reading the old dir
    until its meta-fingerprint refresh. Retention: the previous segments
    dir survives one more compaction (grace for in-flight readers); dirs
    two generations old are deleted here."""
    import shutil
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ..index.build import (
        BLOCK_SCHEMA,
        IndexMeta,
        _encode_group_fn,
        _manifest_append,
        read_manifest,
        write_meta_atomic,
    )
    from ..index.codec import decode_block, decode_block_positions
    from ..query.wand import DocMask, _alive_in_epoch, _not_excluded

    meta = IndexMeta.load(index_dir)
    tomb_files = _tombstone_files(index_dir)
    # the churn-proof path: past FOLD_CLOSURE_BOUND raw rows the tombstone
    # set never touches the driver — it stays a DataFrame and applies to
    # the decoded postings as an anti-join + watermark filter (Spark picks
    # broadcast vs shuffle join; at billions of tombstones the shuffle is
    # the correct and only plan). Below the bound the zero-shuffle closure
    # fold is strictly faster and driver-safe.
    join_fold = _tombstone_row_total(tomb_files) > FOLD_CLOSURE_BOUND
    if join_fold:
        tomb, upd, upd_wm = None, None, None
    else:
        tomb, upd, upd_wm, tomb_files = _load_tombstone_arrays(
            spark, index_dir, tomb_files
        )
    _ea, _, _cm = _manifest_state(index_dir)
    already_epoch_layout = bool(_ea) or _cm is not None
    if (
        already_epoch_layout
        and not meta.stream_epochs
        and tomb is None
        and upd is None
        and not join_fold
    ):
        # nothing to fold AND already epoch-layout → true no-op. A pure
        # batch build (no epoch lines, no compaction marker) falls through:
        # one compaction pass is the documented way to CONVERT it to the
        # epoch layout so append_docs/update_docs can extend it.
        return meta
    seg_dir = os.path.join(index_dir, meta.segments_dir)
    blocks = spark.read.parquet(seg_dir)
    has_pos = meta.has_positions
    drop_mask = DocMask(upd=upd, upd_wm=upd_wm) if upd is not None else None
    any_drop = tomb is not None or upd is not None or join_fold

    release_fold = None
    if join_fold:
        postings, n_dead_join, release_fold = _join_fold_postings(
            spark, blocks, tomb_files, has_pos
        )
    else:
        postings = blocks.mapInPandas(
            _fold_rows_fn(has_pos, tomb, drop_mask), _fold_schema(has_pos)
        )
        n_dead_join = 0

    new_n_docs, new_total_len, new_avgdl = meta.n_docs, meta.total_len, meta.avgdl
    dict_rel = meta.dictionary_dir
    n_compactions = sum(
        1 for m in read_manifest(index_dir) if m.get("kind") == "compaction"
    )
    if any_drop:
        # physical removal changes the corpus: recompute n_docs/avgdl from
        # the SURVIVING postings and rebuild the dictionary under them —
        # df/idf stop counting deleted docs from here on (the Lucene
        # "deletes apply at merge" point)
        postings.persist()
        surv = (
            postings.select("doc_id", "doc_len")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("tot"))
            .collect()[0]
        )
        new_n_docs = int(surv["n"] or 0)
        new_total_len = int(surv["tot"] or 0)
        new_avgdl = (new_total_len / new_n_docs) if new_n_docs else 1.0
        u_expr = (F.col("tf") * (meta.k1 + 1.0)) / (
            F.col("tf")
            + meta.k1 * (1.0 - meta.b + meta.b * F.col("doc_len") / new_avgdl)
        )
        dct = (
            postings.groupBy("term")
            .agg(
                F.first("bucket").alias("bucket"),
                F.count(F.lit(1)).alias("df"),
                F.sum("tf").alias("cf"),
                F.max(u_expr).alias("max_u"),
                F.max("tf").alias("max_tf"),
                F.min("doc_len").alias("min_dl"),
            )
            .withColumn(
                "idf",
                F.log(
                    1.0
                    + (F.lit(float(new_n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
            )
        )
        dict_rel = f"dictionary_c{n_compactions + 1}"
        dct.write.mode("overwrite").parquet(os.path.join(index_dir, dict_rel))

    encode = _encode_group_fn(meta.k1, meta.b, new_avgdl, meta.block_size)
    enc = postings.groupBy("bucket", "doc_range").applyInPandas(encode, BLOCK_SCHEMA)

    new_rel = f"segments_c{n_compactions + 1}"
    # keep the streamed epoch=<id>/bucket=<id> layout (as epoch 0) so later
    # epochs from the live stream can keep appending without mixing
    # partition depths in one directory
    enc.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(index_dir, new_rel, "epoch=0")
    )
    n_blocks = spark.read.parquet(os.path.join(index_dir, new_rel)).count()

    prev_rel = meta.segments_dir
    folded = meta.stream_epochs
    meta.stream_epochs = 0
    meta.segments_dir = new_rel
    if any_drop:
        # physical removal is the point where the corpus statistics change:
        # the queryable state flips to the surviving-docs n/avgdl and the
        # rebuilt dictionary in one commit
        meta.n_docs = new_n_docs
        meta.total_len = new_total_len
        meta.avgdl = new_avgdl
        meta.dictionary_dir = dict_rel
        n_dead = n_dead_join + (0 if tomb is None else len(tomb)) + (
            0 if upd is None else len(upd)
        )
        meta.fingerprint = f"{meta.fingerprint}-del{n_dead}"
        postings.unpersist()
    if release_fold is not None:
        release_fold()  # postings are materialized; drop the tombstone caches

    # marker first (commit point — later epochs derive their state relative
    # to it AND find the segments dir through it), then the atomic meta swap
    _manifest_append(
        index_dir,
        {
            "kind": "compaction",
            "bucket": None,
            "epochs_folded": folded,
            "n_blocks": int(n_blocks),
            "segments_dir": new_rel,
            "prev_segments_dir": prev_rel,
            # post-state totals + dictionary: recovery and the NEXT epoch
            # resume from here when this marker is the latest commit
            "n_docs_total": meta.n_docs,
            "total_len_total": meta.total_len,
            "dictionary_dir": meta.dictionary_dir,
            "has_positions": bool(has_pos),
            "analyzer": meta.analyzer,
            "tombstones_applied": int(n_dead_join)
            + (0 if tomb is None else int(len(tomb)))
            + (0 if upd is None else int(len(upd))),
            "ts": time.time(),
        },
    )
    write_meta_atomic(index_dir, meta)
    # the tombstones this compaction consumed are now physically applied;
    # files appended by concurrent delete_docs() calls are NOT in tomb_files
    # and survive for the next compaction
    for p in tomb_files:
        try:
            os.remove(p)
        except OSError:
            pass

    # two-generation retention: the dir we just superseded stays for
    # in-flight readers; anything older than it goes now
    keep = {new_rel, prev_rel}
    for name in os.listdir(index_dir):
        if (
            name == "segments"
            or name.startswith("segments_c")
            or name.startswith("segments_m")
        ) and name not in keep:
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
    return meta


def merge_epochs_tiered(
    spark: SparkSession, index_dir: str, max_segments: int = 8
) -> "IndexMeta":
    """Serialized entry point: same per-index maintenance lock as
    ``compact_streamed_index`` (merge and compact both swap the segments
    dir — they must never race each other)."""
    lock, token = _maintenance_lock_acquire(index_dir)
    hb = _LockHeartbeat(lock, token)
    try:
        return _merge_epochs_tiered_impl(spark, index_dir, max_segments)
    finally:
        hb.stop()
        _maintenance_lock_release(lock, token)


def _merge_epochs_tiered_impl(
    spark: SparkSession, index_dir: str, max_segments: int = 8
) -> "IndexMeta":
    """Lucene TieredMergePolicy analogue: when more than ``max_segments``
    streamed epoch-segments exist, fold the SMALLEST ones into one — never
    the whole index. Full compaction rewrites every byte (write
    amplification O(index size) per pass); tiered merge rewrites only the
    small tail, so a long-lived streaming index pays O(bytes · log(epochs))
    total like an LSM tree, while query-side block fragmentation stays
    bounded at ``max_segments`` runs per term.

    Semantics:
      * folded epochs decode → current tombstones/update-watermarks apply
        AT EACH BLOCK'S ORIGINAL EPOCH (superseded versions die; the
        current version of an updated doc survives) → re-encode under the
        CURRENT meta avgdl → written as ONE epoch keeping id
        max(folded ids). Keeping the max id preserves the watermark
        invariant: any update watermark wm targeting a folded old version
        had wm ≥ its old epoch, and was applied here; any FUTURE update
        gets wm ≥ merged id, so merged postings die correctly.
      * corpus stats and the dictionary are untouched (df/cf keep the
        documented until-full-compaction drift for deleted docs; blocks
        carry max_tf/min_dl so the robust pruning bound stays valid —
        ``stream_epochs`` stays > 0 on purpose).
      * tombstone FILES are not consumed (unmerged epochs still need
        them); re-masking merged blocks at query time is a no-op.
      * the compacted base (``epoch=0`` written by a prior compaction) is
        never folded — it is the big bottom tier.

    Commit protocol (same discipline as compaction): merged blocks are
    written into a fresh versioned dir ``segments_m<K>``; UNMERGED epoch
    dirs are hard-linked in (O(#files) metadata, zero data copy — on an
    object store this becomes a manifest of file pointers); then the
    ``merge`` manifest marker, then the atomic meta swap. The live dir is
    never mutated, a crash at any point leaves a readable index, and
    ``_commit_epoch``'s race guard aborts any epoch that was encoding
    across the swap. Two-generation dir retention like compaction.

    Returns the (possibly unchanged) IndexMeta."""
    import shutil

    from ..index.build import (
        BLOCK_SCHEMA,
        IndexMeta,
        _encode_group_fn,
        _manifest_append,
        read_manifest,
        write_meta_atomic,
    )
    from ..query.wand import DocMask

    if max_segments < 1:
        raise ValueError("max_segments must be ≥ 1")
    meta = IndexMeta.load(index_dir)
    _, epochs_since, compaction = _manifest_state(index_dir)
    live = {
        int(m["epoch"]): int(m.get("n_docs", 0))
        for m in epochs_since
        # a compacted base shares the epoch=0 partition value — never fold
        # a stream epoch that would collide with it
        if not (compaction is not None and int(m["epoch"]) == 0)
    }
    # coalesce through PRIOR merge markers: stream_epoch lines are never
    # consumed, so without this the candidate count never shrinks and
    # every maintenance call past the budget re-merges the merged tier
    # forever (no fixed point). A marker whose folded ids aren't all live
    # predates the last compaction — skip it.
    for m in read_manifest(index_dir):
        if m.get("kind") != "merge":
            continue
        folded_prev = [int(e) for e in m.get("epochs_folded", [])]
        if folded_prev and all(e in live for e in folded_prev):
            total = sum(live.pop(e) for e in folded_prev)
            live[int(m["merged_epoch"])] = total
    cand = sorted(live.items())
    if len(cand) <= max_segments:
        return meta  # under budget — no-op
    n_fold = len(cand) - max_segments + 1
    folded = sorted(cand, key=lambda x: (x[1], x[0]))[:n_fold]
    folded_ids = sorted(e for e, _ in folded)
    merged_id = max(folded_ids)

    seg_dir = os.path.join(index_dir, meta.segments_dir)
    has_pos = meta.has_positions
    blocks = spark.read.parquet(seg_dir).filter(
        F.col("epoch").isin([int(e) for e in folded_ids])
    )
    tfiles = _tombstone_files(index_dir)
    release_fold = None
    if _tombstone_row_total(tfiles) > FOLD_CLOSURE_BOUND:
        # same churn bound as compaction: a tombstone set too big for the
        # kernel closure applies as a distributed anti-join + watermark
        # filter (shared helper — the drop rules must never diverge).
        # Application is NOT optional here even though merge never
        # consumes tombstone files — folding renumbers postings up to
        # max(folded ids), so an unapplied update watermark inside the
        # folded range would stop covering its superseded version.
        postings, _n_dead, release_fold = _join_fold_postings(
            spark, blocks, tfiles, has_pos
        )
    else:
        tomb, upd, upd_wm, _files = _load_tombstone_arrays(
            spark, index_dir, tfiles
        )
        drop_mask = DocMask(upd=upd, upd_wm=upd_wm) if upd is not None else None
        postings = blocks.mapInPandas(
            _fold_rows_fn(has_pos, tomb, drop_mask), _fold_schema(has_pos)
        )
    encode = _encode_group_fn(meta.k1, meta.b, meta.avgdl, meta.block_size)
    enc = postings.groupBy("bucket", "doc_range").applyInPandas(
        encode, BLOCK_SCHEMA
    )
    n_merges = sum(
        1 for m in read_manifest(index_dir) if m.get("kind") == "merge"
    )
    new_rel = f"segments_m{n_merges + 1}"
    new_dir = os.path.join(index_dir, new_rel)
    enc.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(new_dir, f"epoch={merged_id}")
    )
    n_blocks = spark.read.parquet(
        os.path.join(new_dir, f"epoch={merged_id}")
    ).count()
    if release_fold is not None:
        release_fold()  # merged blocks are written; drop the tombstone caches

    # hard-link the UNMERGED epoch dirs into the new versioned dir —
    # metadata-only, the parquet bytes exist once on disk
    folded_names = {f"epoch={e}" for e in folded_ids}
    for name in sorted(os.listdir(seg_dir)):
        if not name.startswith("epoch=") or name in folded_names:
            continue
        src_root = os.path.join(seg_dir, name)
        for root, _dirs, files in os.walk(src_root):
            rel = os.path.relpath(root, seg_dir)
            dst_root = os.path.join(new_dir, rel)
            os.makedirs(dst_root, exist_ok=True)
            for fn in files:
                dst = os.path.join(dst_root, fn)
                if not os.path.exists(dst):
                    os.link(os.path.join(root, fn), dst)

    prev_rel = meta.segments_dir
    meta.segments_dir = new_rel
    meta.fingerprint = f"{meta.fingerprint}-m{n_merges + 1}"
    _manifest_append(
        index_dir,
        {
            "kind": "merge",
            "bucket": None,
            "epochs_folded": [int(e) for e in folded_ids],
            "merged_epoch": int(merged_id),
            "n_blocks": int(n_blocks),
            "segments_dir": new_rel,
            "prev_segments_dir": prev_rel,
            "has_positions": bool(has_pos),
            "analyzer": meta.analyzer,
            "ts": time.time(),
        },
    )
    write_meta_atomic(index_dir, meta)

    keep = {new_rel, prev_rel}
    for name in os.listdir(index_dir):
        if (
            name == "segments"
            or name.startswith("segments_c")
            or name.startswith("segments_m")
        ) and name not in keep:
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
    return meta


def streaming_term_counts(stream_df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Continuously-maintained (term, cf) aggregate — write with
    outputMode('update')/('complete') for a live collection-frequency
    dictionary. ONE streaming aggregation by design: chaining the batch
    path's tf→dictionary aggs is two stateful operators, which Structured
    Streaming rejects (global-watermark correctness check); exact df is
    maintained by the ``incremental_index`` foreachBatch path instead, where
    each micro-batch runs full batch semantics."""
    from ..tokenizer import tokenize_raw_expr

    toks = stream_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))


def streaming_window_stats(
    stream_df: DataFrame,
    ts_col: str = "event_time",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    text_col: str = "text",
) -> DataFrame:
    """Event-time windowed ingest stats with late-data watermark:
    (window, n_docs, avg_len). Aggregates append-finalize once the watermark
    passes the window end."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.length(text_col)).alias("avg_len"),
        )
    )


def read_stream_manifest(index_dir: str) -> list[dict]:
    p = os.path.join(index_dir, "manifest.jsonl")
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(x) for x in f if x.strip() and "stream_epoch" in x]
