"""Segment-backed query engine: pruned scan → per-doc-range kernel →
bounded-heap merge.

API parity with the reference's Part C surface
(``Part C/search_engine_1.py`` ``build_index_from_parquet`` / ``search``):

    eng = SearchEngine(spark, index_dir)
    eng.build_index_from_df(corpus_df)          # or resume
    n, ranked = eng.search("query text", k=100)

Query lifecycle (SURVEY.md §3.3 Spark lifecycle):
  1. driver parses the query (same tokenizer as indexing;
     ``Part C/searcher.py:38``), resolves terms against the dictionary —
     a filtered Parquet read with an ``isin`` pushdown (J1; terms missing
     from the dictionary are dropped like the reference does).
  2. segment scan pruned twice: Parquet partition pruning on ``bucket``
     (term-hash; the analogue of the reference's first-letter posting dirs)
     + row-group predicate pushdown on ``term`` (J2).
  3. per doc_range group (disjoint unsigned-doc-id ranges): block-max WAND or
     vectorized exact kernel → ≤k local candidates from a bounded heap.
  4. global merge: either ``orderBy(score desc, doc_id asc).limit(k)``
     (Spark plans TakeOrderedAndProject — per-partition heap + driver merge)
     or an explicit RDD ``treeReduce`` heap merge (north-star wording);
     both produce identical results (tested).
"""

from __future__ import annotations

import heapq
import math
import os
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..index.build import IndexMeta, build_index
from ..scoring import parse_query
from .wand import DocMask, score_group_vectorized, score_group_wand

RESULT_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("score", DoubleType())]
)


def bm25_idf(n: int, df: int) -> float:
    """BM25 idf exactly as the index build computes it
    (``index/build.py`` stage B): ln(1 + (n − df + 0.5)/(df + 0.5)).
    Driver-side float64 twin used when scoring under GLOBAL statistics
    (sharded search) — same formula, same argument shapes."""
    return math.log(1.0 + (float(n) - float(df) + 0.5) / (float(df) + 0.5))


def _range_bound(s: str):
    """A query-string range bound compared with its natural type: int if it
    parses as one, else float, else the literal string (lexicographic)."""
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            continue
    return s


class SearchEngine:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        tombstone_limit: int = 10_000_000,
    ):
        self.spark = spark
        self.index_dir = index_dir
        # churn bound: the query-time delete/update mask is a driver-held
        # sorted-u64 array shipped with the kernel closure — cheap to ~10^7
        # entries (80 MB). Past ``tombstone_limit`` raw tombstone rows the
        # engine FOLDS them physically (compact_streamed_index) before
        # building the mask, so the driver never holds an unbounded
        # tombstone table no matter how much delete/update traffic arrives.
        self.tombstone_limit = int(tombstone_limit)
        self._meta: IndexMeta | None = None
        self._meta_sig: tuple[int, int] | None = None
        self._dict_df: DataFrame | None = None
        self._seg_df: DataFrame | None = None
        # term → base dictionary row (None = known-absent): repeated query
        # terms skip the per-query dictionary collect — one of the two
        # driver round-trips in the sequential search() hot path
        self._term_cache: dict[str, dict | None] = {}
        self._term_cache_cap = 65536
        self._tomb: "object" = None  # (sig, sorted-u64 array | None)

    # -- build ---------------------------------------------------------------
    def build_index_from_df(self, corpus: DataFrame, **kwargs) -> IndexMeta:
        self.refresh()
        self._meta = build_index(self.spark, corpus, self.index_dir, **kwargs)
        self._meta_sig = self._stat_meta()
        return self._meta

    def build_index_from_parquet(self, path: str, **kwargs) -> IndexMeta:
        """Reference-parity entry point (``Part C/search_engine_1.py:30``)."""
        return self.build_index_from_df(self.spark.read.parquet(path), **kwargs)

    # -- query ---------------------------------------------------------------
    def refresh(self) -> None:
        """Drop cached dictionary/segment handles — next search re-reads the
        on-disk index. Called automatically when meta.json changes on disk
        (rebuilds or streamed epochs from another process)."""
        if self._dict_df is not None:
            self._dict_df.unpersist()
        self._dict_df = None
        self._seg_df = None
        self._meta = None
        self._term_cache = {}
        self._tomb = None

    def _stat_meta(self) -> tuple[int, int]:
        st = os.stat(os.path.join(self.index_dir, "meta.json"))
        return (st.st_mtime_ns, st.st_size)

    @property
    def meta(self) -> IndexMeta:
        sig = self._stat_meta()
        if self._meta is None or sig != self._meta_sig:
            self.refresh()
            self._meta = IndexMeta.load(self.index_dir)
            self._meta_sig = sig
        return self._meta

    # -- deletion (tombstones) ------------------------------------------------
    def delete_docs(self, doc_ids) -> int:
        """Tombstone documents: excluded from every query (or/and/batch/
        phrase) IMMEDIATELY, without touching the immutable segments —
        Lucene-style deletes. Corpus statistics (df/idf/avgdl) keep counting
        deleted docs until ``compact_streamed_index`` physically removes
        them and rebuilds the dictionary/meta (standard until-merge
        semantics, documented). Tombstones append as parquet under
        ``tombstones/``; readers pick them up via a directory fingerprint,
        so deletes propagate across engine handles like meta changes do.

        ``doc_ids`` may be an iterable of ids (bounded explicit-list path)
        or a single-column DataFrame — the DataFrame path writes the
        tombstones DISTRIBUTED (executors → parquet append), so a
        web-scale id set never materializes on the driver."""
        if isinstance(doc_ids, DataFrame):
            return self._write_tombstones_df(doc_ids, wm=None)
        return self._write_tombstones(doc_ids, wm=None)

    def delete_by_query(
        self, query: str, mode: str = "or", doc_filter=None
    ) -> int:
        """ES ``_delete_by_query``: tombstone the FULL match set of a
        boolean query (``mode`` = "or" | "and") WITHOUT collecting it —
        the matched DataFrame (``matching_docs``: pruned segment scan,
        set kernel) is appended straight to the tombstone directory as a
        distributed write, so a web-scale match set never passes through
        the driver (contrast ``delete_docs``, whose explicit id list is
        the bounded-closure path). Semantics afterwards are identical to
        ``delete_docs``: immediate exclusion from every query surface,
        stats unchanged until ``compact_streamed_index`` folds the
        tombstones physically. Returns the number of docs tombstoned
        (already-deleted docs don't match, so repeats return 0)."""
        matched = self.matching_docs(query, mode=mode, doc_filter=doc_filter)
        out = matched.select(
            F.col("doc_id"), F.lit(None).cast("long").alias("wm")
        ).persist()
        try:
            n = out.count()
            if n:
                out.write.mode("append").parquet(
                    os.path.join(self.index_dir, "tombstones")
                )
                self._tomb = None
                self._maybe_fold_tombstones()
        finally:
            out.unpersist()
        return n

    def _maybe_fold_tombstones(self) -> None:
        """Write-side churn check: every tombstone write calls this, so the
        table folds physically (``compact_streamed_index``) as soon as raw
        rows cross ``tombstone_limit`` — including the flagship case of ONE
        huge distributed ``delete_by_query``/``delete_docs(df)`` batch,
        which then never reaches a query-time driver read at all (the fold
        itself is the join-fold past FOLD_CLOSURE_BOUND: executor-bounded
        end to end). The query-path check remains as the safety net for
        writers that bypass this engine."""
        from ..streaming.ingest import (
            MaintenanceInProgress,
            _tombstone_files,
            _tombstone_row_total,
            compact_streamed_index,
        )

        tfiles = _tombstone_files(self.index_dir)
        if _tombstone_row_total(tfiles) <= self.tombstone_limit:
            return
        import logging

        logging.getLogger(__name__).warning(
            "tombstone write crossed tombstone_limit=%d — folding now",
            self.tombstone_limit,
        )
        try:
            compact_streamed_index(self.spark, self.index_dir)
        except MaintenanceInProgress:
            pass  # a concurrent fold is already consuming the files
        self._tomb = None

    def _write_tombstones(self, doc_ids, wm: int | None) -> int:
        """Append tombstone rows. ``wm=None`` → plain delete (dead in every
        epoch); ``wm=E`` → update tombstone (dead only in epochs ≤ E, so a
        re-added version in a later epoch survives)."""
        ids = sorted({int(d) for d in doc_ids})
        if not ids:
            return 0
        df = self.spark.createDataFrame(
            [(d, wm) for d in ids], "doc_id long, wm long"
        )
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.index_dir, "tombstones")
        )
        self._tomb = None
        self._maybe_fold_tombstones()
        return len(ids)

    def _write_tombstones_df(self, ids_df: DataFrame, wm: int | None) -> int:
        """Distributed twin of ``_write_tombstones``: the id frame's FIRST
        column flows straight from executors into the tombstone directory
        (dedup is one partial-agg shuffle; no driver materialization of the
        id set — the only driver value is the count). Same semantics:
        ``wm=None`` plain delete, ``wm=E`` update tombstone."""
        out = (
            ids_df.select(F.col(ids_df.columns[0]).cast("long").alias("doc_id"))
            .where(F.col("doc_id").isNotNull())
            .distinct()
            .select("doc_id", F.lit(wm).cast("long").alias("wm"))
            .persist()
        )
        try:
            n = out.count()
            if n:
                out.write.mode("append").parquet(
                    os.path.join(self.index_dir, "tombstones")
                )
                self._tomb = None
                self._maybe_fold_tombstones()
        finally:
            out.unpersist()
        return n

    def update_docs(
        self,
        updates: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """Replace documents in place (Lucene ``updateDocument`` analogue):
        write epoch-watermarked tombstones for the incoming doc_ids (their
        OLD postings — every epoch up to now — die at decode time), then
        append the new versions as a fresh epoch via ``append_docs``. The
        new epoch's id is > the watermark, so the new version is the one
        that scores; phrase/NEAR/snippets see only the new position stream.

        Stats semantics (standard Lucene until-merge behaviour, documented):
        dictionary df/cf and n_docs/avgdl count BOTH versions until
        ``compact_streamed_index`` physically drops the superseded postings
        and rebuilds exact statistics. Requires an epoch-layout index
        (``append_docs``/``incremental_index`` builds, or a compacted one).
        Returns the number of updated docs.

        The tombstone write is DISTRIBUTED (``_write_tombstones_df``): the
        incoming id set never collects to the driver, so a 100 TB reindex
        churn batch is executor-bounded end to end (``append_docs`` itself
        only ever collects per-bucket manifest aggregates)."""
        from ..streaming.ingest import _manifest_state, append_docs

        if updates.isEmpty():
            return 0
        epochs_all, _, compaction = _manifest_state(self.index_dir)
        wm = max(
            [int(e["epoch"]) for e in epochs_all]
            + ([0] if compaction is not None else [])
            or [-1]
        )
        if wm < 0:
            raise ValueError(
                "update_docs needs an existing epoch-layout index "
                "(nothing committed yet — use append_docs to create one)"
            )
        n = self._write_tombstones_df(updates.select(id_col), wm=wm)
        append_docs(updates, self.index_dir, id_col=id_col, text_col=text_col)
        return n

    def update_by_query(
        self,
        query: str,
        transform,
        mode: str = "or",
        doc_filter=None,
        corpus_df: "DataFrame | None" = None,
    ) -> int:
        """ES ``_update_by_query``: re-ingest every doc matching ``query``
        after applying ``transform`` (a DataFrame→DataFrame callable over
        the matched docs' source rows; it must preserve the id and text
        columns). Source rows come from ``corpus_df`` when given (an
        external source-of-truth table, semi-joined with the match set —
        no doc store needed), else from the index's own doc store
        (``store_source=True`` build).

        In the doc-store path the store's affected ``doc_part`` partitions
        are REWRITTEN with the new versions (dynamic partition overwrite),
        so ``fetch``/``search_fetch``/``reindex`` keep seeing exactly one —
        current — version per doc. The partition rewrite is not
        transactional (a crash mid-write can leave affected partitions
        needing a re-run); postings-side replacement goes through
        ``update_docs`` (epoch-watermarked tombstone + fresh epoch), which
        commits manifest-first and is crash-safe. Requires an epoch-layout
        index, like every update (one ``compact_streamed_index`` converts
        a batch build). Returns the number of docs updated."""
        meta = self.meta
        matched = self.matching_docs(query, mode=mode, doc_filter=doc_filter)
        if corpus_df is not None:
            id_col = meta.source_id_col if meta.has_source else "doc_id"
            # caller tables may use any id column name; match on the first
            id_col = id_col if id_col in corpus_df.columns else corpus_df.columns[0]
            text_col = (
                meta.source_text_col
                if meta.source_text_col and meta.source_text_col in corpus_df.columns
                else "text"
            )
            hit = corpus_df.join(
                matched.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
            ).persist()
            try:
                if hit.count() == 0:
                    return 0
                updated = transform(hit)
                return self.update_docs(updated, id_col=id_col, text_col=text_col)
            finally:
                hit.unpersist()
        if not meta.has_source:
            raise ValueError(
                "update_by_query needs corpus_df= or a doc store "
                "(build with store_source=True)"
            )
        id_col, text_col = meta.source_id_col, meta.source_text_col
        if not text_col:
            raise ValueError(
                "source meta predates source_text_col — pass corpus_df="
            )
        src_path = os.path.join(self.index_dir, "source")
        src = self.spark.read.parquet(src_path)
        m = matched.select(F.col("doc_id").alias(id_col))
        hit = src.join(m, id_col, "left_semi").persist()
        try:
            if hit.count() == 0:
                return 0
            updated = transform(hit.drop("doc_part"))
            missing = {id_col, text_col} - set(updated.columns)
            if missing:
                raise ValueError(f"transform dropped required columns {missing}")
            n = self.update_docs(updated, id_col=id_col, text_col=text_col)
            # store refresh: rewrite ONLY the affected doc_part partitions —
            # unchanged rows of those partitions carried over, new versions in
            parts = sorted(
                int(r["doc_part"])
                for r in hit.select("doc_part").distinct().collect()
            )
            n_parts = 1 << meta.range_bits
            keep = (
                src.filter(F.col("doc_part").isin(parts))
                .join(m, id_col, "left_anti")
            )
            new_rows = updated.select(*[c for c in src.columns if c != "doc_part"]).withColumn(
                "doc_part", F.pmod(F.col(id_col), F.lit(n_parts)).cast("int")
            )
            # localCheckpoint cuts the plan's lineage off src_path — Spark
            # refuses to overwrite a path its own plan still reads from
            combined = (
                keep.unionByName(new_rows.select(*keep.columns))
                .repartition("doc_part")
                # keep the builder's sorted-by-id layout: parquet row-group
                # min/max stats keep skipping for point fetches
                .sortWithinPartitions(id_col)
                .localCheckpoint()
            )
            prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                combined.write.mode("overwrite").partitionBy("doc_part").parquet(src_path)
            finally:
                self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            return n
        finally:
            hit.unpersist()

    def _tombstones(self):
        """(plain, upd, upd_wm): ``plain`` = sorted-u64 ids dead everywhere
        (deletes); ``upd``/``upd_wm`` = sorted-u64 updated ids + parallel
        int64 epoch watermarks (dead only in epochs ≤ wm — the superseded
        versions). Cached against the tombstone dir fingerprint. Collected
        to the driver and shipped with the kernel closure — fine to ~10^7
        entries; past ``tombstone_limit`` raw rows the engine auto-compacts
        first (``compact_streamed_index`` folds every tombstone physically
        and empties the directory), so the driver table stays BOUNDED under
        arbitrary delete/update churn. A doc both deleted and updated is
        plain-dead (the delete wins: it came after the update, or the
        update's new version was itself deleted). Pre-upgrade tombstone
        files (no ``wm`` column) read as plain deletes."""
        import numpy as np

        empty = (None, None, None)
        path = os.path.join(self.index_dir, "tombstones")
        if not os.path.isdir(path):
            self._tomb = None
            return empty
        names = sorted(
            n for n in os.listdir(path) if n.endswith(".parquet")
        )
        sig = tuple(
            (n, os.stat(os.path.join(path, n)).st_mtime_ns) for n in names
        )
        if self._tomb is not None and self._tomb[0] == sig:
            return self._tomb[1]
        over_limit = (
            bool(names)
            and self._tombstone_rows(path, names) > self.tombstone_limit
        )
        if not names:
            out = empty
        elif not over_limit:
            # fast path: raw rows fit the driver — one columnar read, the
            # dedup/last-wins/override rules run in numpy
            pdf = (
                self.spark.read.schema("doc_id long, wm long")
                .parquet(path)
                .toPandas()
            )
            ids = pdf["doc_id"].to_numpy(dtype="int64").view("uint64")
            wm = pdf["wm"].to_numpy(dtype="float64")  # NaN = plain delete
            plain_ids = np.unique(ids[np.isnan(wm)])
            um = ~np.isnan(wm)
            upd, upd_wm = None, None
            if um.any():
                uid, uw = ids[um], wm[um].astype(np.int64)
                # keep the HIGHEST watermark per doc (latest update wins)
                order = np.lexsort((uw, uid))
                uid, uw = uid[order], uw[order]
                last = np.concatenate((uid[1:] != uid[:-1], [True]))
                upd, upd_wm = uid[last], uw[last]
                if len(plain_ids):
                    # a plain delete overrides any update of the same doc
                    keep = ~np.isin(upd, plain_ids)
                    upd, upd_wm = upd[keep], upd_wm[keep]
                if len(upd) == 0:
                    upd, upd_wm = None, None
            out = (
                plain_ids if len(plain_ids) else None,
                upd,
                upd_wm,
            )
        else:
            # churn bound crossed (an unchecked writer got past the
            # write-side fold): the mask is O(DISTINCT docs), so dedup/
            # last-wins/override reduce DISTRIBUTED and only one row per
            # doc reaches the driver. A distinct count still over the
            # limit means NO driver mask can exist — fold physically and
            # raise an actionable error (the retry serves from the folded
            # index with an empty mask).
            out = self._tombstones_distributed_read(path)
        if over_limit:
            # fold the tombstones physically NOW so the steady-state mask
            # stays ≤ tombstone_limit. Order matters for the in-flight
            # query: the mask was built BEFORE the fold, and the pre-fold
            # mask stays valid against both the old segments (the caller's
            # already-planned scan; old dir survives one generation) and
            # the new ones (masking a physically-dropped doc is a no-op) —
            # so we return it as-is and only the NEXT query re-reads the
            # now-empty tombstone dir. If another process is already
            # folding, serve with the mask we have and let its fold land.
            import logging

            from ..streaming.ingest import (
                MaintenanceInProgress,
                compact_streamed_index,
            )

            logging.getLogger(__name__).warning(
                "tombstone table exceeds tombstone_limit=%d — folding via "
                "compact_streamed_index",
                self.tombstone_limit,
            )
            try:
                compact_streamed_index(self.spark, self.index_dir)
            except MaintenanceInProgress:
                pass  # concurrent fold in flight — it will consume the files
            self._tomb = None  # next call re-reads the emptied dir
        else:
            self._tomb = (sig, out)
        return out

    def _tombstones_distributed_read(self, path: str):
        """(plain, upd, upd_wm) via a DISTRIBUTED per-doc reduction: one
        groupBy(doc_id) computes has-plain-delete + max watermark, so the
        driver receives exactly one row per distinct tombstoned doc
        regardless of raw row count. Raises (after folding) if even the
        distinct set exceeds ``tombstone_limit`` — past that no driver-held
        mask is possible and the only correct serve is post-fold."""
        import numpy as np

        agg = (
            self.spark.read.schema("doc_id long, wm long")
            .parquet(path)
            .groupBy("doc_id")
            .agg(
                F.max(F.col("wm").isNull().cast("int")).alias("has_plain"),
                F.max("wm").alias("wm"),
            )
        )
        pdf = agg.toPandas()
        if len(pdf) > self.tombstone_limit:
            from ..streaming.ingest import (
                MaintenanceInProgress,
                compact_streamed_index,
            )

            try:
                compact_streamed_index(self.spark, self.index_dir)
            except MaintenanceInProgress:
                pass
            self._tomb = None
            raise RuntimeError(
                f"{len(pdf)} distinct tombstoned docs exceed "
                f"tombstone_limit={self.tombstone_limit}: no driver-held "
                "mask can represent them. The tombstones have been folded "
                "physically (compact_streamed_index — or a concurrent fold "
                "is completing them) — retry the query; it will serve from "
                "the folded segments."
            )
        ids = pdf["doc_id"].to_numpy(dtype="int64").view("uint64")
        plain_m = pdf["has_plain"].to_numpy() == 1
        plain_ids = np.sort(ids[plain_m])
        upd, upd_wm = None, None
        um = ~plain_m & pdf["wm"].notna().to_numpy()
        if um.any():
            uid = ids[um]
            uw = pdf["wm"].to_numpy(dtype="float64")[um].astype(np.int64)
            order = np.argsort(uid)
            upd, upd_wm = uid[order], uw[order]
        return (
            plain_ids if len(plain_ids) else None,
            upd,
            upd_wm,
        )

    @staticmethod
    def _tombstone_rows(path: str, names: list[str]) -> int:
        """Total tombstone row count from parquet FOOTERS only (delegates
        to the maintenance layer's counter — one implementation for the
        query path and the fold-mode decision)."""
        from ..streaming.ingest import _tombstone_row_total

        return _tombstone_row_total([os.path.join(path, n) for n in names])

    def _doc_mask(self, doc_filter=None) -> "DocMask | None":
        """Combine tombstones with an optional filtered-search allow-set
        into the decode-time kernel mask. ``doc_filter``: iterable of doc_ids
        or a single-column DataFrame (collected — the small-allow-set path;
        push big predicates through the relational scorer as joins
        instead)."""
        import numpy as np

        excluded, upd, upd_wm = self._tombstones()
        included = None
        if doc_filter is not None:
            if isinstance(doc_filter, DataFrame):
                ids = [int(r[0]) for r in doc_filter.collect()]
            else:
                ids = [int(d) for d in doc_filter]
            included = np.unique(np.asarray(ids, dtype=np.int64).view("uint64"))
        if excluded is None and included is None and upd is None:
            return None
        return DocMask(excluded, included, upd, upd_wm)

    def _analyze(self, query: str | list[str]) -> list[str]:
        """Query-side analysis under the INDEX's pinned analyzer
        (meta.analyzer — Lucene's rule: query and index must analyze
        identically or `getFooBar` would never match its own document).
        Returns the token list; every query surface tokenizes through
        here. A pre-analyzed token LIST passes through verbatim: internal
        surfaces re-feed terms that are already analyzer OUTPUT, and
        re-running a non-idempotent analyzer (stem: classes→class→clas)
        would turn them into dictionary misses that silently empty
        phrase/query-string/common-terms/MLT results."""
        if isinstance(query, (list, tuple)):
            return list(query)
        from ..tokenizer import analyze_py

        return analyze_py(query, self.meta.analyzer)

    def _resolve_terms(self, query: str, rewriter=None) -> list[dict]:
        """J1: query terms ⋈ dictionary via filtered read (pushdown).
        A rewriter (expansion.py) may add/correct terms with weights; the
        weight is folded into idf so both kernels stay unchanged.

        Dictionary rows are memoized per engine (negative entries included)
        so repeated terms across sequential queries cost zero Spark jobs —
        the cache is dropped with the other handles on ``refresh()``
        (meta-fingerprint change), so streamed epochs can never serve stale
        df/idf."""
        from ..expansion import rewrite_query

        self.meta  # trigger the staleness check → refresh clears the cache
        weighted = rewrite_query(self._analyze(query), rewriter)
        wmap = dict(weighted)
        # resolve THIS query fully before any eviction: a cap-triggered
        # clear() must never turn the current query's already-cached terms
        # into silent dictionary misses (they'd be indistinguishable from
        # negative entries and the query would score without them)
        resolved = {
            t: self._term_cache[t] for t, _ in weighted if t in self._term_cache
        }
        missing = [t for t, _ in weighted if t not in resolved]
        if missing:
            rows = self._load_dict().filter(F.col("term").isin(missing)).collect()
            found = {r["term"]: r.asDict() for r in rows}
            for t in missing:
                resolved[t] = found.get(t)
            if len(self._term_cache) + len(missing) > self._term_cache_cap:
                self._term_cache.clear()
            self._term_cache.update(resolved)
        out = []
        for t, _ in weighted:
            base = resolved.get(t)
            if base is None:
                continue
            d = dict(base)
            d["idf"] = float(d["idf"]) * wmap[t]
            d["w"] = wmap[t]  # kept separately: global-stats scoring refolds
            out.append(d)
        return out

    def _load_dict(self) -> DataFrame:
        """Cached dictionary handle — the small hot side (term, bucket, df,
        cf, idf, max_u); on a cluster this is the broadcast analogue of the
        reference's in-memory inverted_idx. meta.dictionary_dir follows the
        streamed epoch-merge pointer."""
        if self._dict_df is None:
            self._dict_df = self.spark.read.parquet(
                os.path.join(self.index_dir, self.meta.dictionary_dir)
            ).cache()
        return self._dict_df

    def _pruned_blocks(
        self, buckets: list[int], terms: list[str],
        avgdl_override: float | None = None,
    ) -> DataFrame:
        """Segment blocks for (buckets, terms) with a VALID max_u pruning
        bound. The cached parquet handle lists files once per engine;
        partition pruning keeps each query's scan to its terms' buckets.
        For a streamed index (epochs encoded under their own running avgdl —
        stored max_u may UNDER-estimate u at query time, unsafe for pruning)
        max_u is rebound to the avgdl-robust u(max_tf, min_dl, current
        avgdl) ≥ true block max; ``avgdl_override`` (sharded scatter-gather:
        scoring under GLOBAL stats that differ from this shard's build-time
        stats) forces the same rebind under the given avgdl. JVM-side column
        rewrite; kernels and exact scores (decoded raw tf/dl) are
        unaffected."""
        blocks = self._all_blocks().filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        meta = self.meta
        avgdl_bind = avgdl_override if avgdl_override is not None else (
            meta.avgdl if meta.stream_epochs else None
        )
        if avgdl_bind is not None:
            k1, b = meta.k1, meta.b
            u_robust = (F.col("max_tf") * (k1 + 1.0)) / (
                F.col("max_tf")
                + k1 * (1.0 - b + b * F.col("min_dl") / avgdl_bind)
            )
            blocks = blocks.withColumn("max_u", u_robust)
        return blocks

    def search(
        self,
        query: str,
        k: int = 100,
        mode: str = "or",
        use_wand: bool = True,
        merge: str = "take_ordered",
        rewriter=None,
        doc_filter=None,
        after: tuple[int, float] | None = None,
        exclude: str = "",
        scorer: str = "bm25",
        mu: float = 2000.0,
        global_stats: "tuple[int, float, dict] | None" = None,
        min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        """→ [(doc_id, score)] top-k, tie-break (score desc, doc_id asc).
        ``global_stats``: (n_docs, avgdl, {term: df}) — score under these
        corpus statistics instead of this index's own (the scatter phase of
        sharded search: every shard must rank under the GLOBAL idf/avgdl or
        per-shard scores aren't comparable — ES DFS_QUERY_THEN_FETCH).
        Per-term idf is recomputed from the global (n, df); stored block-max
        bounds were built under shard-local avgdl, so they are rebound
        avgdl-robustly (same mechanism as streamed epochs) and WAND pruning
        stays exact. BM25-only and exclusive with rewriters (a rewriter's
        weights are folded into shard-local idf, which global scoring
        replaces).
        ``exclude``: boolean NOT (Lucene MUST_NOT) — documents containing
        ANY of these (tokenized) terms are dropped from the result; they
        add nothing to the score. Exclusion wins over a term that also
        appears in the positive query (in ``mode="and"`` that contradiction
        returns []); OOV exclude terms occur in no document and are no-ops.
        The veto is resolved entirely in-group (doc_range salting co-locates
        a doc's postings for every term), so NOT costs one extra term's
        blocks in the scan, not a shuffle or an anti-join. NOT queries run
        the exhaustive kernels: block-max pruning optimizes the unfiltered
        objective (reference §2.10 has no NOT — Lucene MUST_NOT semantics).
        ``doc_filter``: restrict results to these doc_ids (metadata-filtered
        search; scores keep corpus-wide statistics — see ``DocMask``).
        ``after``: deep-pagination cursor — the LAST RESULT TUPLE (doc_id,
        score) of the previous page (``hits[-1]`` verbatim); only results strictly after it in result
        order return (Elasticsearch search_after semantics: state lives in
        the cursor, no server-side scroll, and per-group top-k truncation
        stays exact at ANY page depth because the filter runs inside the
        kernels before selection). Pagination routes through the exhaustive
        kernels: block-max pruning optimizes the unfiltered-top-k objective
        and is disabled for cursored pages.

        ``min_should_match``: ES minimum_should_match — an OR result must
        match at least this many DISTINCT query terms (0/1 = plain OR;
        |q| ≡ mode="and"). Counted over dictionary-resolved terms, so a
        requirement the surviving vocabulary cannot reach returns [] (an
        OOV clause can never match — same arithmetic ES applies). Routes
        through the exhaustive kernels: block-max bounds optimize the
        unconstrained objective (a Lucene WANDScorer with minShouldMatch
        would need per-count bounds).

        ``scorer``: "bm25" (default) or "lm" — LM Dirichlet (μ = ``mu``)
        runs on the SAME index (blocks carry raw tf/dl; cf from the
        dictionary, C = Σ doc_len from meta) via a per-term u override in
        the exhaustive kernel; the stored block-max metadata is the BM25
        bound, so WAND pruning is BM25-only (as in Lucene, where non-BM25
        similarities need their own impacts)."""
        meta = self.meta
        if global_stats is not None and scorer != "bm25":
            raise ValueError(
                "global_stats composes only with BM25 scoring"
            )
        msm = int(min_should_match)
        if msm > 1 and mode != "or":
            raise ValueError("min_should_match applies to mode='or' only")
        dict_rows = self._resolve_terms(query, rewriter)
        if not dict_rows:
            return []
        ex_rows = self._resolve_terms(exclude) if exclude else []
        ex_terms = frozenset(r["term"] for r in ex_rows)
        idf = {
            r["term"]: float(r["idf"])
            for r in dict_rows
            if r["term"] not in ex_terms  # exclusion wins (kernel contract)
        }
        avgdl_override = None
        if global_stats is not None:
            g_n, g_avgdl, g_df = global_stats
            w_of = {r["term"]: float(r.get("w", 1.0)) for r in dict_rows}
            missing = sorted(set(idf) - set(g_df))
            if missing:
                raise ValueError(
                    f"global_stats df map lacks terms {missing} — gather "
                    "stats over the REWRITTEN term set (a rewriter that "
                    "adds terms needs their global df too)"
                )
            idf = {t: bm25_idf(g_n, g_df[t]) * w_of.get(t, 1.0) for t in idf}
            avgdl_override = float(g_avgdl)
        if not idf:
            return []
        u_fns = None
        if scorer == "lm":
            if rewriter is not None:
                raise ValueError("scorer='lm' does not compose with rewriters")
            from .wand import lm_u_fn

            c_total = float(meta.total_len or round(meta.n_docs * meta.avgdl))
            # qtf under the INDEX analyzer: the default tokenizer would
            # produce different tokens on code/stem indexes and KeyError
            qtf = dict(parse_query(self._analyze(query)))
            idf = {t: float(qtf[t]) for t in idf}  # LM weight = qtf
            u_fns = {
                r["term"]: lm_u_fn(mu * (float(r["cf"]) / c_total), mu)
                for r in dict_rows
                if r["term"] in idf
            }
        elif scorer != "bm25":
            raise ValueError(f"unknown scorer: {scorer!r}")
        if mode == "and":
            from ..expansion import rewrite_query

            # conjunctive semantics are over the PARSED query: a term absent
            # from the dictionary occurs in no document, so the intersection
            # is empty (matches scoring.boolean_and and the Python oracle);
            # a term that is also excluded is a contradiction
            if {t for t, _ in rewrite_query(self._analyze(query), rewriter)} - set(idf):
                return []
        buckets = sorted(
            {int(r["bucket"]) for r in dict_rows} | {int(r["bucket"]) for r in ex_rows}
        )
        terms = sorted(set(idf) | ex_terms)
        blocks = self._pruned_blocks(buckets, terms, avgdl_override)
        if msm > 1 and msm > len(idf):
            return []  # requirement exceeds the matchable clause count
        kernel = (
            score_group_wand
            if use_wand and after is None and not ex_terms and u_fns is None
            and msm <= 1
            # a rewriter may fold a NEGATIVE weight into idf — then
            # idf*max_u is a LOWER bound and block-max pruning would drop
            # true top-k docs; negative-weight queries take the exact path
            and all(v >= 0.0 for v in idf.values())
            else score_group_vectorized
        )
        k1, b = meta.k1, meta.b
        avgdl = avgdl_override if avgdl_override is not None else meta.avgdl
        n_query_terms = len(idf)  # global-AND guard (see kernel docstring)
        mask = self._doc_mask(doc_filter)

        if after is not None or ex_terms or u_fns is not None or msm > 1:

            def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
                return score_group_vectorized(
                    pdf, idf, k1, b, avgdl, k, mode, n_query_terms, mask,
                    after, ex_terms or None, u_fns, msm if msm > 1 else None,
                )

        else:

            def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
                return kernel(pdf, idf, k1, b, avgdl, k, mode, n_query_terms, mask)

        cand = blocks.groupBy("doc_range").applyInPandas(run_group, RESULT_SCHEMA)

        if merge == "tree_reduce":
            # north-star wording: bounded min-heap per partition merged via
            # treeReduce. Heap item = (score, -doc_id) so the min-heap evicts
            # (lowest score, largest doc) first.
            kk = k

            def part_heap(rows):
                h: list[tuple[float, int]] = []
                for row in rows:
                    item = (row["score"], -row["doc_id"])
                    if len(h) < kk:
                        heapq.heappush(h, item)
                    elif item > h[0]:
                        heapq.heapreplace(h, item)
                yield h

            def merge_heaps(a, b_):
                h = a
                for item in b_:
                    if len(h) < kk:
                        heapq.heappush(h, item)
                    elif item > h[0]:
                        heapq.heapreplace(h, item)
                return h

            heaps = cand.rdd.mapPartitions(part_heap)
            final = heaps.treeReduce(merge_heaps) if not heaps.isEmpty() else []
            items = sorted(final, key=lambda x: (-x[0], -x[1]))
            return [(-nd, s) for s, nd in items]

        rows = (
            cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        )
        return [(r["doc_id"], r["score"]) for r in rows]

    def search_batch(
        self, queries: dict[str, str], k: int = 100, rewriter=None,
        prune: bool = False, mode: str = "or", doc_filter=None,
        global_stats: "tuple[int, float, dict] | None" = None,
    ) -> dict[str, list[tuple[int, float]]]:
        """Batched segment search: ONE dictionary lookup, ONE pruned segment
        scan, and ONE job score the whole query batch — each term's blocks
        decode once per group and are shared by every query touching them.
        This is the segment-path throughput shape for a cluster: per-query
        driver overhead (term resolution round-trip, job submission, result
        merge) is the Amdahl term that caps per-query scaling, and batching
        amortizes it to O(1) per batch. Per-query results are identical to
        ``search(..., use_wand=False)`` (tested).

        ``prune=True`` routes each query through the block-max sweep with a
        batch-shared decode cache (see ``score_group_multi``) — the right
        choice on idf-skewed corpora where θ cutoffs skip whole blocks;
        exhaustive (default) wins when bounds are flat."""
        from pyspark.sql.types import StringType

        from ..expansion import rewrite_query

        meta = self.meta
        if global_stats is not None and rewriter is not None:
            raise ValueError("global_stats does not compose with rewriters")
        per_q = {
            qid: rewrite_query(self._analyze(q), rewriter)
            for qid, q in queries.items()
        }
        union_terms = sorted({t for w in per_q.values() for t, _ in w})
        if not union_terms:
            return {qid: [] for qid in queries}
        rows = self._load_dict().filter(F.col("term").isin(union_terms)).collect()
        if global_stats is not None:
            g_n, g_avgdl, g_df = global_stats
            base_idf = {
                r["term"]: bm25_idf(g_n, g_df[r["term"]]) for r in rows
            }
        else:
            base_idf = {r["term"]: float(r["idf"]) for r in rows}
        buckets = sorted({int(r["bucket"]) for r in rows})
        idfs = {
            qid: {t: base_idf[t] * w for t, w in weighted if t in base_idf}
            for qid, weighted in per_q.items()
        }
        if mode == "and":
            # conjunctive semantics over the PARSED query: any term missing
            # from the dictionary empties that query (see search())
            idfs = {
                qid: m
                for qid, m in idfs.items()
                if len(m) == len(per_q[qid]) and m
            }
            if not idfs:
                return {qid: [] for qid in queries}
        live_terms = sorted({t for m in idfs.values() for t in m})
        if not live_terms:
            return {qid: [] for qid in queries}
        avgdl_override = float(global_stats[1]) if global_stats else None
        blocks = self._pruned_blocks(buckets, live_terms, avgdl_override)
        k1, b = meta.k1, meta.b
        avgdl = avgdl_override if avgdl_override is not None else meta.avgdl

        from .wand import score_group_multi

        batch_schema = StructType(
            [StructField("query_id", StringType())] + list(RESULT_SCHEMA.fields)
        )

        mask = self._doc_mask(doc_filter)

        # same guard as search(): a rewriter-folded NEGATIVE weight turns
        # the block-max bound into a lower bound — those batches must not
        # theta-prune
        safe_prune = prune and all(
            v >= 0.0 for m in idfs.values() for v in m.values()
        )

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_group_multi(pdf, idfs, k1, b, avgdl, k,
                                     prune=safe_prune, mode=mode, mask=mask)

        cand = blocks.groupBy("doc_range").applyInPandas(run_group, batch_schema)
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        pdf = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .toPandas()  # Arrow batch transfer: |batch|·k rows land driver-
            # side in one columnar hop instead of |batch|·k py4j Row objects
            # — the collect path was the batch's dominant serial term
        )
        pdf = pdf.sort_values(["query_id", "rn"])
        out: dict[str, list[tuple[int, float]]] = {qid: [] for qid in queries}
        for qid, doc, score in zip(pdf["query_id"], pdf["doc_id"], pdf["score"]):
            out[qid].append((int(doc), float(score)))
        return out

    def _positional_candidates(self, query: str, doc_filter,
                               make_kernel, global_stats=None) -> DataFrame:
        """Shared scaffolding for positional (phrase / NEAR) queries:
        positions check, tokenize, dictionary resolve, pruned block scan,
        one applyInPandas kernel per doc_range — returns the DISTRIBUTED
        candidate DataFrame (doc_id, score), never collected here.
        ``make_kernel(terms, idf, k1, b, avgdl, mask)`` returns the
        per-group pdf→pdf kernel. ``global_stats`` (n, avgdl, {term: df})
        scores under GLOBAL corpus statistics — the sharded scatter phase;
        a term missing from THIS shard's dictionary still empties the
        candidate set (no doc here can contain it), which is exactly the
        per-shard truth."""

        meta = self.meta
        if not meta.has_positions:
            raise ValueError(
                "index was built without positions — rebuild with "
                "with_positions=True for index-native positional queries"
            )
        empty = self.spark.createDataFrame([], RESULT_SCHEMA)
        terms = self._analyze(query)
        if not terms:
            return empty
        dict_rows = self._resolve_terms(sorted(set(terms)))
        if len(dict_rows) < len(set(terms)):
            return empty  # a query term is absent from the corpus → no match
        if global_stats is not None:
            g_n, g_avgdl, g_df = global_stats
            idf = {r["term"]: bm25_idf(g_n, g_df[r["term"]]) for r in dict_rows}
            avgdl = float(g_avgdl)
        else:
            idf = {r["term"]: float(r["idf"]) for r in dict_rows}
            avgdl = meta.avgdl
        buckets = sorted({int(r["bucket"]) for r in dict_rows})
        blocks = self._pruned_blocks(
            buckets, sorted(idf),
            avgdl if global_stats is not None else None,
        )
        mask = self._doc_mask(doc_filter)
        run_group = make_kernel(terms, idf, meta.k1, meta.b, avgdl, mask)
        return blocks.groupBy("doc_range").applyInPandas(run_group, RESULT_SCHEMA)

    def _positional_query(self, query: str, k: int, doc_filter,
                          make_kernel, global_stats=None) -> list[tuple[int, float]]:
        """``_positional_candidates`` + global top-k merge."""
        cand = self._positional_candidates(query, doc_filter, make_kernel,
                                           global_stats)
        rows = cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    # -- doc store (query-then-fetch) -----------------------------------------
    def fetch(self, doc_ids) -> DataFrame:
        """Point-fetch stored source rows by id (ES GET /_source; the
        fetch phase of query-then-fetch). Requires a ``store_source=True``
        build. The scan prunes to the hit ids' doc_part partitions (low id
        bits — computable WITHOUT touching the store), so a k-row fetch
        reads at most k partitions' files, not the corpus: the partition
        layout IS the point-lookup index."""
        meta = self.meta
        if not meta.has_source:
            raise ValueError(
                "index has no doc store — build with store_source=True"
            )
        ids = list(doc_ids)
        n_parts = 1 << meta.range_bits
        parts = sorted({d % n_parts for d in ids})  # python % == Spark pmod
        src = self.spark.read.parquet(os.path.join(self.index_dir, "source"))
        return src.filter(F.col("doc_part").isin(parts)).filter(
            F.col(meta.source_id_col).isin(ids)
        ).drop("doc_part")

    def search_fetch(self, query: str, k: int = 10, **kw) -> list[dict]:
        """Top-k search + source fetch in one call: ranked hits with their
        stored fields attached (two jobs — the scored index scan, then the
        pruned point fetch)."""
        hits = self.search(query, k=k, **kw)
        if not hits:
            return []
        id_col = self.meta.source_id_col
        rows = {r[id_col]: r.asDict() for r in self.fetch(d for d, _ in hits).collect()}
        out = []
        for rank, (doc_id, score) in enumerate(hits, 1):
            row = dict(rows.get(doc_id) or {id_col: doc_id})
            row.update(rank=rank, score=score)
            out.append(row)
        return out

    def search_phrase(self, phrase: str, k: int = 100,
                      doc_filter=None, global_stats=None) -> list[tuple[int, float]]:
        """Index-native exact-phrase top-k (requires
        ``build_index_from_df(..., with_positions=True)``): AND intersection
        → positional adjacency verify → BM25 over the phrase's terms, all on
        the segment streams — the corpus text is never re-read. Results are
        rank-identical to the relational ``scoring.phrase_topk`` (tested)."""
        from .phrase import score_group_phrase

        def make_kernel(terms, idf, k1, b, avgdl, mask):
            def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
                return score_group_phrase(pdf, idf, k1, b, avgdl, k, terms,
                                          mask)
            return run_group

        return self._positional_query(phrase, k, doc_filter, make_kernel,
                                      global_stats)

    def search_phrase_prefix(
        self,
        phrase: str,
        k: int = 100,
        max_expansions: int = 50,
        doc_filter=None,
    ) -> list[tuple[int, float]]:
        """ES ``match_phrase_prefix`` (search-as-you-type): the LAST token
        of ``phrase`` is a prefix; the dictionary expands it to at most
        ``max_expansions`` completions ((df desc, term asc) cap — the same
        rewrite discipline as wildcard/fuzzy), and a doc matches iff the
        fixed tokens chain adjacently with some completion at the next
        position. Requires a positional build.

        Score = BM25 over the distinct fixed terms + max over COMPLETING
        expansions of idf_e·u_e (pinned convention — see
        ``score_group_phrase_prefix``). One pruned segment scan covers
        fixed terms and all expansions; the per-group kernel resolves
        matching and scoring with zero extra jobs."""
        from .phrase import score_group_phrase_prefix

        meta = self.meta
        if not meta.has_positions:
            raise ValueError(
                "index was built without positions — rebuild with "
                "with_positions=True for index-native positional queries"
            )
        # the last WHITESPACE token is the prefix and must NOT go through
        # the analyzer (it is not a complete token — the tokenizer would
        # drop a 1-char prefix and stemming would mangle a partial word);
        # the fixed part gets the index's full analysis like any phrase
        raw = phrase.strip().split()
        if not raw:
            return []
        prefix = raw[-1].lower()
        fixed = self._analyze(" ".join(raw[:-1]))
        exps = self.expand_pattern(prefix + "*", max_expansions)
        if not exps:
            return []
        all_terms = sorted(set(fixed) | set(exps))
        dict_rows = self._resolve_terms(all_terms)
        present = {r["term"] for r in dict_rows}
        if any(t not in present for t in set(fixed)):
            return []  # a fixed term absent from the corpus → no match
        idf = {r["term"]: float(r["idf"]) for r in dict_rows}
        buckets = sorted({int(r["bucket"]) for r in dict_rows})
        blocks = self._pruned_blocks(buckets, sorted(idf))
        mask = self._doc_mask(doc_filter)
        exps_in = [e for e in exps if e in present]

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_group_phrase_prefix(
                pdf, idf, meta.k1, meta.b, meta.avgdl, k, fixed, exps_in, mask
            )

        cand = blocks.groupBy("doc_range").applyInPandas(run_group, RESULT_SCHEMA)
        rows = cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def phrase_matching_docs(self, phrase: str, doc_filter=None) -> DataFrame:
        """FULL set of docs containing the exact phrase, as a distributed
        DataFrame[doc_id] (never collected): the phrase kernel with an
        unbounded per-group k. Feeds query-string phrase constraints and
        any match-set consumer (facets over a phrase, etc.)."""
        from .phrase import score_group_phrase

        k_all = 1 << 62  # per-group truncation disabled

        def make_kernel(terms, idf, k1, b, avgdl, mask):
            def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
                return score_group_phrase(pdf, idf, k1, b, avgdl, k_all,
                                          terms, mask)
            return run_group

        cand = self._positional_candidates(phrase, doc_filter, make_kernel)
        return cand.select("doc_id")

    def search_query_string(
        self,
        qs: str,
        k: int = 100,
        metadata: DataFrame | None = None,
        use_wand: bool = True,
        scorer: str = "bm25",
        mu: float = 2000.0,
        global_stats=None,
    ) -> list[tuple[int, float]]:
        """Lucene-style query string (see ``querylang``): bare terms SHOULD,
        ``+term`` MUST, ``-term`` MUST_NOT, ``"…"`` exact phrase (needs a
        positional index), ``field:value`` metadata filter (needs
        ``metadata`` with a doc_id column).

        Scoring: BM25 (or ``scorer="lm"``) OR over SHOULD + MUST + phrase
        terms; ``term^w`` boosts scale that term's idf (folded in by
        ``_resolve_terms``, so the kernels — including the WAND block-max
        bounds, which are computed from the query-side idf map — stay
        unchanged and pruning remains safe); MUST / phrase / filter /
        ``field:[lo TO hi]`` range clauses restrict the result set without
        changing scores (ES filter-context semantics); MUST_NOT vetoes
        inside the kernels. Every constraint resolves to a distributed doc
        set; their intersection becomes ONE decode-time allow-set mask, so
        the scored search itself stays a single pruned scan. An OOV MUST
        or phrase term empties the result (it occurs in no document); an
        OOV MUST_NOT is a no-op. Boosts do not compose with
        ``scorer="lm"`` (LM weights are query tf — ``search`` raises)."""
        from ..querylang import parse_query_string

        p = parse_query_string(qs, self.meta.analyzer)
        positive = p.positive_terms
        if not positive:
            raise ValueError(f"query string has no positive terms: {qs!r}")
        allow: DataFrame | None = None

        def intersect(a: DataFrame | None, b: DataFrame) -> DataFrame:
            return b if a is None else a.join(b, "doc_id").select("doc_id")

        if p.must:
            allow = intersect(allow, self.matching_docs(list(p.must), mode="and"))
        for ph in p.phrases:
            allow = intersect(allow, self.phrase_matching_docs(ph))
        if p.filters or p.ranges or p.neg_filters:
            if metadata is None:
                raise ValueError(
                    "query string has field filters "
                    f"{p.filters + p.neg_filters + p.ranges} "
                    "but no metadata DataFrame was provided"
                )
            for f, v in p.filters:
                allow = intersect(
                    allow,
                    metadata.filter(F.col(f) == v).select("doc_id"),
                )
            for f, v in p.neg_filters:
                # ES must_not on a field filter: docs where the field is
                # NOT the value (missing field counts as not-matching-it)
                allow = intersect(
                    allow,
                    metadata.filter(
                        (F.col(f) != v) | F.col(f).isNull()
                    ).select("doc_id"),
                )
            for f, lo, hi in p.ranges:
                cond = F.lit(True)
                if lo is not None:
                    cond = cond & (F.col(f) >= _range_bound(lo))
                if hi is not None:
                    cond = cond & (F.col(f) <= _range_bound(hi))
                allow = intersect(allow, metadata.filter(cond).select("doc_id"))
        rewriter = None
        # boosts now records every mention (implicit 1.0 included, for the
        # max-combine) — only a non-identity boost needs the rewriter
        if any(w != 1.0 for w in p.boosts.values()):
            boosts = dict(p.boosts)

            def rewriter(qterms):
                return [(t, boosts.get(t, 1.0)) for t, _ in qterms]

        return self.search(
            list(positive),
            k=k,
            use_wand=use_wand,
            rewriter=rewriter,
            doc_filter=allow,
            exclude=list(p.must_not) if p.must_not else "",
            scorer=scorer,
            mu=mu,
            global_stats=global_stats,
        )

    def search_near(self, query: str, window: int, k: int = 100,
                    ordered: bool = False,
                    doc_filter=None, global_stats=None) -> list[tuple[int, float]]:
        """Index-native proximity top-k: docs where the query terms co-occur
        within a ``window``-token span of the filtered token stream
        (``ordered=True`` additionally requires query order — phrase with
        slop). Candidates from posting intersection, spans verified on the
        decoded position streams, BM25-scored like phrase — the corpus text
        is never re-read. See ``query.phrase.score_group_near``."""
        from .phrase import score_group_near

        if window < 0:
            raise ValueError("window must be >= 0 tokens")

        def make_kernel(terms, idf, k1, b, avgdl, mask):
            def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
                return score_group_near(pdf, idf, k1, b, avgdl, k, terms,
                                        window, ordered, mask)
            return run_group

        return self._positional_query(query, k, doc_filter, make_kernel,
                                      global_stats)

    def search_span_first(self, phrase: str, limit: int, k: int = 100,
                          doc_filter=None, global_stats=None) -> list[tuple[int, float]]:
        """Lucene SpanFirstQuery top-k: the phrase (a single term is a
        1-word phrase) must match ENDING within the first ``limit`` tokens
        of the filtered stream (span.end ≤ limit, post-stopword positions)
        — the lead-paragraph / title-zone primitive. Candidates, adjacency,
        BM25 scoring, and tie-break identical to ``search_phrase``; the
        kernel adds only the end-position cut. Needs a positional index."""
        from .phrase import score_group_span_first

        if limit < 1:
            raise ValueError("limit must be >= 1 token")

        def make_kernel(terms, idf, k1, b, avgdl, mask):
            def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
                return score_group_span_first(pdf, idf, k1, b, avgdl, k,
                                              terms, limit, mask)
            return run_group

        return self._positional_query(phrase, k, doc_filter, make_kernel,
                                      global_stats)

    def search_common_terms(self, query: str, cutoff_frequency: float = 0.01,
                            k: int = 100, use_wand: bool = True,
                            doc_filter=None) -> list[tuple[int, float]]:
        """Lucene/ES CommonTermsQuery: query terms split by document
        frequency at ``cutoff_frequency`` (float < 1 → fraction of n_docs,
        value ≥ 1 → absolute df). LOW-df terms drive MATCHING (OR over the
        low group); ALL terms drive SCORING of the matched set — so
        stopword-like terms stop creating matches yet still contribute to
        ranking, with no stopword list. All-common or all-low degenerates
        to the plain OR search (ES's fallback). Matching and scoring both
        run on the pruned segment scan; the matched set rides the same
        allow-set mask as filtered search. The low group is re-analyzed on
        the way into ``matching_docs`` — analyzer outputs are fixpoints
        under every shipped analyzer, so the round-trip is identity."""
        rows = self._resolve_terms(query)
        if not rows:
            return []
        cutoff = float(cutoff_frequency)
        thr = cutoff * self.meta.n_docs if cutoff < 1.0 else cutoff
        all_terms = sorted({r["term"] for r in rows})
        low = sorted({r["term"] for r in rows if float(r["df"]) < thr})
        if not low or low == all_terms:
            return self.search(query, k=k, use_wand=use_wand,
                               doc_filter=doc_filter)
        matched = self.matching_docs(low, mode="or",
                                     doc_filter=doc_filter)
        return self.search(query, k=k, use_wand=use_wand, doc_filter=matched)

    # -- snippets / highlighting -------------------------------------------------
    def snippets(
        self, query: str, window: int = 8, doc_filter=None, rewriter=None
    ) -> DataFrame:
        """Best-window snippet offsets for every doc matching ≥1 query term
        (Lucene highlighter analogue, OR semantics): per doc, the
        ``window``-token span with the most distinct query terms (ties:
        more total matches, then leftmost), as DataFrame[doc_id, start,
        end, n_terms, n_matches] — start/end are 0-based positions in the
        filtered token stream, the offsets a text-side renderer slices.
        Needs a positional index; runs distributed (one kernel per
        doc_range), so highlighting a full match set is one job, not a
        per-doc loop."""
        from .phrase import SNIPPET_SCHEMA, snippet_group

        meta = self.meta
        if not meta.has_positions:
            raise ValueError(
                "index was built without positions — rebuild with "
                "with_positions=True for snippet extraction"
            )
        empty = self.spark.createDataFrame([], SNIPPET_SCHEMA)
        terms = self._analyze(query)
        if not terms:
            return empty
        dict_rows = self._resolve_terms(sorted(set(terms)), rewriter)
        if not dict_rows:
            return empty
        resolved = sorted({r["term"] for r in dict_rows})
        buckets = sorted({int(r["bucket"]) for r in dict_rows})
        blocks = self._pruned_blocks(buckets, resolved)
        mask = self._doc_mask(doc_filter)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return snippet_group(pdf, resolved, window, mask)

        return blocks.groupBy("doc_range").applyInPandas(run_group, SNIPPET_SCHEMA)

    # -- wildcard / prefix queries ---------------------------------------------
    def expand_pattern(self, pattern: str, max_expansions: int | None = 50) -> list[str]:
        """Dictionary-backed wildcard expansion (Lucene ``PrefixQuery`` /
        ``WildcardQuery`` analogue): glob ``*`` (any run) / ``?`` (one char)
        against the term dictionary, capped at ``max_expansions`` by
        (df desc, term asc) — the top-terms rewrite discipline, keeping the
        expanded OR bounded no matter how promiscuous the pattern. The
        literal prefix before the first wildcard is pushed down to the
        dictionary parquet scan as a ``StartsWith`` filter, so ``ind*`` reads
        only matching row groups instead of the whole vocabulary."""
        import re

        pattern = pattern.lower()
        head = re.split(r"[*?]", pattern, maxsplit=1)[0]
        rx = "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern
        ) + "$"
        d = self._load_dict()
        if head:
            d = d.filter(F.col("term").startswith(head))
        q = (
            d.filter(F.col("term").rlike(rx))
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
        )
        # None = UNCAPPED (dictionary-sized, the broadcast-small side) —
        # the sharded gather needs the full match set before its
        # global-df cap, same rule as suggest(n=None)
        if max_expansions is not None:
            q = q.limit(max_expansions)
        return sorted(r["term"] for r in q.collect())

    def search_wildcard(
        self,
        pattern: str,
        k: int = 100,
        max_expansions: int = 50,
        doc_filter=None,
        use_wand: bool = True,
    ) -> list[tuple[int, float]]:
        """Top-k BM25 over the OR of the dictionary terms matching a glob
        pattern (each expanded term keeps its own idf — Lucene's scoring
        boolean rewrite). A pattern matching nothing returns []."""
        terms = self.expand_pattern(pattern, max_expansions)
        if not terms:
            return []
        expanded = [(t, 1.0) for t in terms]
        return self.search(
            pattern,
            k=k,
            use_wand=use_wand,
            doc_filter=doc_filter,
            rewriter=lambda _qterms: expanded,
        )

    def expand_regexp(self, rx: str, max_expansions: int | None = 50) -> list[str]:
        """Dictionary-backed regexp expansion (Lucene ``RegexpQuery``
        analogue): anchored full-term match (the whole term must match, as
        in Lucene — wrap in ``.*`` yourself for substring semantics),
        capped at ``max_expansions`` by (df desc, term asc). A literal
        prefix at the head of the pattern (after an optional ``^``) is
        pushed down to the dictionary parquet scan as ``StartsWith`` so
        ``merg.*`` never scans the whole vocabulary; patterns with no
        literal head fall back to the full (broadcast-small) dictionary
        scan, as Lucene does for leading wildcards."""
        import re as _re

        rx = rx.lower()
        body = rx[1:] if rx.startswith("^") else rx
        head_m = _re.match(r"[a-z0-9_]+", body)
        head = head_m.group(0) if head_m else ""
        # a '|' at paren depth 0 ANYWHERE makes the literal head just one
        # branch's prefix, not a required prefix of every match → no pushdown
        depth = 0
        for c in body:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "|" and depth == 0:
                head = ""
                break
        if head and len(head) < len(body) and body[len(head)] in "*?{":
            # a quantifier makes the head's last char optional/repeated —
            # drop it from the pushdown prefix
            head = head[:-1]
        # implicit full-term anchoring (Lucene semantics); the non-capturing
        # group keeps alternation correct ("a|b" must not parse as ^a | b$)
        anchored = "^(?:" + (body[:-1] if body.endswith("$") else body) + ")$"
        d = self._load_dict()
        if head:
            d = d.filter(F.col("term").startswith(head))
        q = (
            d.filter(F.col("term").rlike(anchored))
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
        )
        # None = UNCAPPED (dictionary-sized, the broadcast-small side) —
        # the sharded gather needs the full match set before its
        # global-df cap, same rule as suggest(n=None)
        if max_expansions is not None:
            q = q.limit(max_expansions)
        return sorted(r["term"] for r in q.collect())

    def search_regexp(
        self,
        rx: str,
        k: int = 100,
        max_expansions: int = 50,
        doc_filter=None,
        use_wand: bool = True,
    ) -> list[tuple[int, float]]:
        """Top-k BM25 over the OR of dictionary terms fully matching a
        regexp (each expanded term keeps its own idf — Lucene's scoring
        boolean rewrite, same discipline as ``search_wildcard``)."""
        terms = self.expand_regexp(rx, max_expansions)
        if not terms:
            return []
        expanded = [(t, 1.0) for t in terms]
        return self.search(
            rx,
            k=k,
            use_wand=use_wand,
            doc_filter=doc_filter,
            rewriter=lambda _qterms: expanded,
        )

    # -- fuzzy queries ---------------------------------------------------------
    def expand_fuzzy(
        self,
        term: str,
        max_edits: int = 2,
        prefix_length: int = 0,
        max_expansions: int | None = 50,
    ) -> list[tuple[str, float]]:
        """Dictionary-backed fuzzy expansion (Lucene ``FuzzyQuery``
        analogue): terms within ``max_edits`` Levenshtein distance of
        ``term``, capped at ``max_expansions`` by (distance asc, df desc,
        term asc), each weighted by the classic Lucene similarity boost
        ``1 - dist / min(len(term), len(match))`` (exact match → 1.0;
        non-positive boosts dropped). ``prefix_length`` requires that many
        leading chars to match exactly and is pushed down to the dictionary
        parquet scan as a ``StartsWith`` filter; the length band
        ``|len(match) - len(term)| ≤ max_edits`` prunes JVM-side before the
        O(len²) distance, and Spark's thresholded ``levenshtein`` bails out
        early past ``max_edits``. Returns [(term, boost)]."""
        term = term.lower()
        d = self._load_dict()
        if prefix_length > 0:
            d = d.filter(F.col("term").startswith(term[:prefix_length]))
        dist = F.levenshtein(F.col("term"), F.lit(term), max_edits)
        boost = 1.0 - dist / F.least(F.length("term"), F.lit(len(term)))
        rows = (
            d.filter(
                (F.length("term") >= len(term) - max_edits)
                & (F.length("term") <= len(term) + max_edits)
            )
            .withColumn("dist", dist)
            .filter(F.col("dist") >= 0)  # thresholded levenshtein → -1 past cap
            .withColumn("boost", boost)
            .filter(F.col("boost") > 0)
            .select("term", "df", "dist", "boost")
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        )
        if max_expansions is not None:  # None = uncapped (sharded gather)
            rows = rows.limit(max_expansions)
        return sorted((r["term"], float(r["boost"])) for r in rows.collect())

    def suggest(self, prefix: str, n: int | None = 10) -> list[tuple[str, int]]:
        """Autocomplete: the ``n`` highest-df dictionary terms completing
        ``prefix`` (df desc, term asc), as [(term, df)]. ``n=None``
        returns EVERY match (the sharded gather needs the full set — dfs
        sum across shards, so no fixed cutoff is exact). The prefix is
        pushed down to the dictionary parquet scan as ``StartsWith``; the
        dictionary side is the broadcast-small side of the index, so this
        is a sub-scan of one small table however large the corpus."""
        out = (
            self._load_dict()
            .filter(F.col("term").startswith(prefix.lower()))
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
        )
        rows = (out if n is None else out.limit(n)).collect()
        return [(r["term"], int(r["df"])) for r in rows]

    def indexed_doc_ids(self) -> DataFrame:
        """DataFrame[doc_id] of the batch-built corpus, read from the
        ``docstats`` sidecar (one column, pruned scan). NOTE: streamed
        epochs append postings without extending docstats, so docs added
        via the streaming path are not listed here."""
        return self.spark.read.parquet(
            os.path.join(self.index_dir, "docstats")
        ).select("doc_id")

    def search_fuzzy(
        self,
        term: str,
        k: int = 100,
        max_edits: int = 2,
        prefix_length: int = 0,
        max_expansions: int = 50,
        doc_filter=None,
        use_wand: bool = True,
    ) -> list[tuple[int, float]]:
        """Top-k BM25 over the fuzzy expansion of a single term; each
        expanded term scores with its own idf scaled by the similarity
        boost (folded into idf by ``_resolve_terms``, so both kernels and
        the WAND bounds stay valid — a boost < 1 only shrinks max_u)."""
        expanded = self.expand_fuzzy(term, max_edits, prefix_length, max_expansions)
        if not expanded:
            return []
        return self.search(
            term,
            k=k,
            use_wand=use_wand,
            doc_filter=doc_filter,
            rewriter=lambda _qterms: expanded,
        )

    # -- matched set / facets ----------------------------------------------------
    def matching_docs(
        self, query: str, mode: str = "or", rewriter=None, doc_filter=None
    ) -> DataFrame:
        """FULL matched set of a boolean query as a distributed
        DataFrame[doc_id] — never collected to the driver (a web-scale match
        set is unbounded; downstream consumers aggregate it). Same term
        resolution, bucket/term-pruned segment scan, tombstone masking, and
        cross-range AND guard as ``search``; only the kernel differs (set
        union/intersection instead of top-k scoring)."""
        from .wand import MATCH_SCHEMA, matched_group

        from ..expansion import rewrite_query

        dict_rows = self._resolve_terms(query, rewriter)
        empty = self.spark.createDataFrame([], MATCH_SCHEMA)
        if not dict_rows:
            return empty
        terms = sorted({r["term"] for r in dict_rows})
        if mode == "and" and (
            {t for t, _ in rewrite_query(self._analyze(query), rewriter)} - set(terms)
        ):
            return empty
        buckets = sorted({int(r["bucket"]) for r in dict_rows})
        blocks = self._pruned_blocks(buckets, terms)
        n_query_terms = len(terms)
        mask = self._doc_mask(doc_filter)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return matched_group(pdf, mode, n_query_terms, mask)

        return blocks.groupBy("doc_range").applyInPandas(run_group, MATCH_SCHEMA)

    def scored_docs(self, query: str, doc_filter=None,
                    global_stats=None) -> DataFrame:
        """FULL scored match set of an OR query as a distributed
        DataFrame[doc_id, score] — no top-k cut (downstream combinators
        like ``boolquery`` need complete per-clause frames: a conjunction
        can surface docs a per-clause top-k would have dropped). Same
        term resolution, pruned segment scan, and masking as ``search``;
        the kernel runs exhaustive with an unbounded k. ``global_stats``
        (n, avgdl, {term: df}) scores under GLOBAL corpus statistics —
        the sharded scatter phase; a term absent from THIS shard's
        dictionary still empties the frame (no doc here contains it)."""
        from .wand import score_group_vectorized as _sgv

        _RS = RESULT_SCHEMA

        meta = self.meta
        dict_rows = self._resolve_terms(query)
        if not dict_rows:
            return self.spark.createDataFrame([], _RS)
        k1, b, avgdl = meta.k1, meta.b, meta.avgdl
        if global_stats is not None:
            g_n, g_avgdl, g_df = global_stats
            missing = sorted(
                {r["term"] for r in dict_rows} - set(g_df)
            )
            if missing:
                raise ValueError(
                    f"global_stats df map lacks terms {missing}"
                )
            idf = {r["term"]: bm25_idf(g_n, g_df[r["term"]])
                   for r in dict_rows}
            avgdl = float(g_avgdl)
        else:
            idf = {r["term"]: float(r["idf"]) for r in dict_rows}
        buckets = sorted({int(r["bucket"]) for r in dict_rows})
        blocks = self._pruned_blocks(
            buckets, sorted(idf),
            avgdl if global_stats is not None else None,
        )
        n_terms = len(idf)
        mask = self._doc_mask(doc_filter)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return _sgv(pdf, idf, k1, b, avgdl, 2**31 - 1, "or", n_terms, mask)

        return blocks.groupBy("doc_range").applyInPandas(run_group, _RS)

    def search_bool(
        self, tree: dict, k: int = 100, metadata: DataFrame | None = None,
        global_stats=None,
    ) -> list[tuple[int, float]]:
        """Nested boolean DSL (ES `bool` query) evaluated INDEX-NATIVELY:
        term leaves score from the segments via ``scored_docs``; range
        leaves filter the ``metadata`` frame; the tree combines with the
        same relational combinators as ``boolquery.bool_score`` (one job
        however deep the nesting). → top-k [(doc_id, score)].
        ``global_stats``: score every term leaf under global corpus
        statistics (the sharded scatter phase)."""
        from ..boolquery import IndexLeaves, eval_tree

        out = eval_tree(tree, IndexLeaves(self, metadata,
                                          global_stats=global_stats))
        rows = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def facet_counts(
        self,
        query: str,
        metadata: DataFrame,
        facet_col: str,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Facet counts over the FULL match set (Solr/Elasticsearch facet
        semantics — not top-k-limited): matched doc_ids ⋈ metadata on
        doc_id, then count per facet value. Both sides stay distributed: the
        join shuffles on doc_id (ranges already partition the matched side
        evenly) and the count aggregates with map-side partials, so the
        plan survives a match set of any size. Returns
        DataFrame[facet_col, n]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        return (
            m.join(metadata.select("doc_id", facet_col), "doc_id")
            .groupBy(facet_col)
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def facet_stats(
        self,
        query: str,
        metadata: DataFrame,
        stat_col: str,
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Numeric stats aggregation over the FULL match set (Elasticsearch
        ``stats`` aggregation): n/min/max/sum/avg of ``stat_col``, optionally
        grouped by a facet column ``by``. Same distributed shape as
        ``facet_counts`` — matched ids ⋈ metadata, then one hash aggregation
        with map-side partials; nothing about the match set ever lands on
        the driver."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", stat_col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.min(stat_col).alias("min"),
            F.max(stat_col).alias("max"),
            F.sum(stat_col).alias("sum"),
            F.avg(stat_col).alias("avg"),
        ]
        return j.groupBy(by).agg(*aggs) if by else j.agg(*aggs)

    def search_sorted(
        self,
        query: str,
        metadata: DataFrame,
        sort_col: str,
        k: int = 100,
        ascending: bool = True,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> list[tuple]:
        """Field-sorted retrieval (Elasticsearch ``sort`` by field instead
        of ``_score``; Lucene SortField): top-k of the FULL match set
        ordered by a metadata column, ties broken on doc_id asc. The match
        set comes from the same pruned index kernels as ``search``; the
        sort is ``orderBy().limit()`` → TakeOrderedAndProject (per-
        partition heaps, no global sort), so "newest 100 matching docs"
        over a 10^12-doc match set moves k rows per partition, nothing
        more. Returns [(doc_id, sort_value)]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", sort_col), "doc_id")
        key = F.asc(sort_col) if ascending else F.desc(sort_col)
        rows = j.orderBy(key, F.asc("doc_id")).limit(k).collect()
        return [(r["doc_id"], r[sort_col]) for r in rows]

    def facet_extended_stats(
        self,
        query: str,
        metadata: DataFrame,
        stat_col: str,
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Extended stats aggregation over the FULL match set (Elasticsearch
        ``extended_stats``): the ``stats`` fields plus sum-of-squares,
        population variance, and population std deviation — one hash
        aggregation with map-side partials, same shape as ``facet_stats``."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", stat_col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        c = F.col(stat_col)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.min(stat_col).alias("min"),
            F.max(stat_col).alias("max"),
            F.sum(stat_col).alias("sum"),
            F.avg(stat_col).alias("avg"),
            F.sum(c * c).alias("sum_sq"),
            F.var_pop(stat_col).alias("variance"),
            F.stddev_pop(stat_col).alias("std_dev"),
        ]
        return j.groupBy(by).agg(*aggs) if by else j.agg(*aggs)

    def facet_histogram(
        self,
        query: str,
        metadata: DataFrame,
        stat_col: str,
        interval: float,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Histogram aggregation over the FULL match set (Elasticsearch
        ``histogram``): bucket = floor(value / interval) * interval, count
        per bucket. Same distributed shape as ``facet_counts`` (matched ids
        ⋈ metadata, one hash aggregation with map-side partials); only
        non-empty buckets return (ES ``min_doc_count=1``). Returns
        DataFrame[bucket, n] with ``bucket`` as the inclusive lower edge."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", stat_col), "doc_id")
        bucket = F.floor(F.col(stat_col) / F.lit(float(interval))) * F.lit(
            float(interval)
        )
        return j.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("n")
        )

    def facet_date_histogram(
        self,
        query: str,
        metadata: DataFrame,
        ts_col: str,
        unit: str = "month",
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Calendar-bucketed histogram over the FULL match set
        (Elasticsearch ``date_histogram`` with ``calendar_interval``):
        bucket = date_trunc(unit, ts), count per bucket. ``unit`` is any
        Spark date_trunc unit (``year quarter month week day hour …``).
        Same distributed shape as ``facet_counts``; only non-empty buckets
        return. The bucket comes back as a DATE-cast STRING so it is
        engine-independent (no timestamp-formatting drift across engines).
        Returns DataFrame[bucket, n]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", ts_col), "doc_id")
        bucket = F.date_trunc(unit, F.col(ts_col)).cast("date").cast("string")
        return j.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("n")
        )

    def facet_date_histogram_pipeline(
        self,
        query: str,
        metadata: DataFrame,
        ts_col: str,
        unit: str = "month",
        window: int = 3,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
        round_dp: int = 5,
    ) -> DataFrame:
        """Elasticsearch PIPELINE aggregations over the date histogram:
        ``cumulative_sum`` (running total), ``derivative`` (bucket-over-
        bucket delta; NULL for the first bucket, like ES skips it), and
        ``moving_fn`` avg over the trailing ``window`` buckets (current
        bucket included — ES shift=window semantics).

        Buckets are the histogram's NON-EMPTY calendar buckets in order
        (ES min_doc_count=1; a gap contributes no zero bucket — densify
        upstream if derivative-over-gaps must see zeros).

        Scale note: the window functions run WITHOUT partitioning — on the
        AGGREGATED frame, which is |buckets| rows (months/days), already
        reduced by the distributed histogram aggregation. Single-partition
        is correct here precisely because the heavy lifting happened in
        the groupBy; never run an unpartitioned window on row-level data.
        Returns DataFrame[bucket, n, cum_n, diff_n, moving_avg]."""
        from pyspark.sql import Window

        if window < 1:
            raise ValueError("window must be ≥ 1")
        h = self.facet_date_histogram(
            query, metadata, ts_col, unit, mode, rewriter, doc_filter
        )
        w = Window.orderBy("bucket")
        mov = w.rowsBetween(-(window - 1), 0)
        return h.select(
            "bucket",
            "n",
            F.sum("n").over(w).alias("cum_n"),
            (F.col("n") - F.lag("n").over(w)).alias("diff_n"),
            F.round(F.avg("n").over(mov), round_dp).alias("moving_avg"),
        )

    def facet_date_histogram_serial_diff(
        self,
        query: str,
        metadata: DataFrame,
        ts_col: str,
        unit: str = "month",
        lag: int = 1,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """ES ``serial_diff`` pipeline agg: n − lag(n, ``lag``) over the
        date-histogram buckets (NULL for the first ``lag`` buckets, like
        ES). lag=1 is the derivative; lag=seasonal-period removes
        seasonality. Same |buckets|-row unpartitioned-window rule as
        facet_date_histogram_pipeline. Returns [bucket, n, sdiff]."""
        from pyspark.sql import Window

        if lag < 1:
            raise ValueError("lag must be ≥ 1")
        h = self.facet_date_histogram(
            query, metadata, ts_col, unit, mode, rewriter, doc_filter
        )
        w = Window.orderBy("bucket")
        return h.select(
            "bucket", "n", (F.col("n") - F.lag("n", lag).over(w)).alias("sdiff")
        )

    def facet_stats_bucket(
        self,
        query: str,
        metadata: DataFrame,
        ts_col: str,
        unit: str = "month",
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
        round_dp: int = 5,
    ) -> DataFrame:
        """ES ``stats_bucket`` (generalizing avg/sum/min/max_bucket): ONE
        row of statistics over the sibling histogram's bucket values —
        buckets, min_n, max_n, sum_n, avg_n. The second-level aggregation
        runs on the |buckets|-row frame; the corpus-scale work is the
        histogram itself."""
        h = self.facet_date_histogram(
            query, metadata, ts_col, unit, mode, rewriter, doc_filter
        )
        return h.agg(
            F.count(F.lit(1)).cast("long").alias("buckets"),
            F.min("n").alias("min_n"),
            F.max("n").alias("max_n"),
            F.sum("n").alias("sum_n"),
            F.round(F.avg("n"), round_dp).alias("avg_n"),
        )

    def facet_percentiles_bucket(
        self,
        query: str,
        metadata: DataFrame,
        ts_col: str,
        percentiles: list[float],
        unit: str = "month",
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
        round_dp: int = 5,
    ) -> DataFrame:
        """ES ``percentiles_bucket``: exact linear-interpolation percentiles
        of the sibling histogram's bucket values — one row with a p<xx>
        column per requested percentile (PERCENTILE_CONT semantics, same
        exactness contract as facet_percentiles). Second-level agg on the
        |buckets|-row frame."""
        if not percentiles or not all(0.0 < p <= 1.0 for p in percentiles):
            raise ValueError("percentiles must be fractions in (0, 1]")
        h = self.facet_date_histogram(
            query, metadata, ts_col, unit, mode, rewriter, doc_filter
        )
        return h.agg(
            *[
                F.round(F.percentile("n", p), round_dp).alias(
                    f"p{int(p * 100):02d}"
                )
                for p in percentiles
            ]
        )

    def facet_multi_terms(
        self,
        query: str,
        metadata: DataFrame,
        by_cols: list[str],
        k: int = 10,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """ES ``multi_terms``: bucket the match set by a COMPOUND key
        (e.g. (lang, source)) and keep the top-k buckets by doc count —
        one hash aggregation with map-side partials, then a
        TakeOrderedAndProject cut (count desc, keys asc — deterministic).
        Returns [*by_cols, n]."""
        if not by_cols:
            raise ValueError("by_cols must name at least one column")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", *by_cols), "doc_id")
        counts = j.groupBy(*by_cols).agg(F.count(F.lit(1)).cast("long").alias("n"))
        return counts.orderBy(
            F.desc("n"), *[F.asc(c) for c in by_cols]
        ).limit(k)

    def facet_percentiles(
        self,
        query: str,
        metadata: DataFrame,
        stat_col: str,
        percentiles: list[float],
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Percentiles aggregation over the FULL match set (Elasticsearch
        ``percentiles``). EXACT linear-interpolation percentiles
        (``F.percentile``, the SQL-standard PERCENTILE_CONT definition —
        identical to DuckDB's quantile_cont, which is what the driver
        oracle checks), NOT the t-digest approximation ES defaults to:
        exactness is the contract of every oracle-checked op here, and
        Spark's exact percentile is still one distributed aggregation.
        At true 100 TB match-set scale swap in ``F.percentile_approx``
        (same call shape, sketch-mergeable, no per-group sort) — named
        trade, not a silent one. Returns one row (or one per ``by`` group)
        with n plus a p<xx> column per requested percentile."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", stat_col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.percentile(F.col(stat_col), F.lit(float(p))).alias(
                f"p{str(round(p * 100, 4)).rstrip('0').rstrip('.')}"
            )
            for p in percentiles
        ]
        return j.groupBy(by).agg(*aggs) if by else j.agg(*aggs)

    def facet_percentile_ranks(
        self,
        query: str,
        metadata: DataFrame,
        stat_col: str,
        values: list[float],
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Percentile-ranks aggregation (Elasticsearch ``percentile_ranks``
        — the inverse of ``facet_percentiles``): for each given value, the
        percentage of the match set's ``stat_col`` values at or below it.
        EXACT (one conditional-count aggregation per value inside a single
        hash agg with map-side partials — no sort, no sketch), so the
        DuckDB twin is a plain count ratio. Returns one row (or one per
        ``by`` group) with n plus a rank_<v> column in [0, 100] per
        requested value."""
        if not values:
            raise ValueError("values must be non-empty")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", stat_col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        aggs = [F.count(F.lit(1)).alias("n")] + [
            (
                100.0
                * F.sum(
                    F.when(F.col(stat_col) <= float(v), 1).otherwise(0)
                )
                / F.count(F.lit(1))
            ).alias(f"rank_{str(round(float(v), 4)).rstrip('0').rstrip('.')}")
            for v in values
        ]
        return j.groupBy(by).agg(*aggs) if by else j.agg(*aggs)

    def facet_composite(
        self,
        query: str,
        metadata: DataFrame,
        keys: list[str],
        size: int = 10,
        after: tuple | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Composite aggregation (ES ``composite``): deterministic
        pagination over the FULL bucket space of ``keys`` — buckets ordered
        by the key tuple ascending, ``size`` per page, resuming STRICTLY
        after the ``after`` key tuple (the last row of the previous page is
        the next call's cursor). Unlike terms facets (top-n by count) this
        enumerates EVERY bucket across pages with bounded driver/page
        memory: one hash aggregation over the match set ⋈ metadata, a
        lexicographic struct filter (identical tuple ordering in Spark and
        SQL — probed), and TakeOrderedAndProject for the page."""
        if not keys:
            raise ValueError("composite needs at least one key column")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        b = (
            m.join(metadata.select("doc_id", *keys), "doc_id")
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        if after is not None:
            if len(after) != len(keys):
                raise ValueError(
                    f"after cursor arity {len(after)} != len(keys) {len(keys)}"
                )
            cursor = F.struct(*[F.lit(v).alias(k) for k, v in zip(keys, after)])
            b = b.filter(F.struct(*keys) > cursor)
        return b.orderBy(*[F.asc(k) for k in keys]).limit(size)

    def facet_cardinality(
        self,
        query: str,
        metadata: DataFrame,
        col: str,
        by: str | None = None,
        approx: bool = False,
        rsd: float = 0.05,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Distinct-count aggregation over the FULL match set (Elasticsearch
        ``cardinality``). ``approx=False`` (default) is EXACT
        count-distinct — one extra shuffle on the counted column, the
        oracle-checkable contract; ``approx=True`` is HyperLogLog++
        (``approx_count_distinct``, relative sd ``rsd``) — ES's own
        default, sketch-mergeable with constant memory per group, the
        100 TB default when the exact shuffle is the bottleneck. Same
        named-trade discipline as ``facet_percentiles``. Returns
        DataFrame[n_distinct] (plus ``by`` when grouped)."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        agg = (
            F.approx_count_distinct(col, rsd) if approx else F.count_distinct(col)
        ).alias("n_distinct")
        return j.groupBy(by).agg(agg) if by else j.agg(agg)

    @staticmethod
    def _unpivot_counts(row_df: DataFrame, names: list[str],
                        key_col: str) -> DataFrame:
        """One-row frame of long count columns → (key_col, n) rows via
        ``stack`` — keeps the whole bucket family inside a single
        aggregation job (no per-bucket query)."""
        quoted = ", ".join(f"'{n}', `{n}`" for n in names)
        return row_df.selectExpr(
            f"stack({len(names)}, {quoted}) AS (`{key_col}`, n)"
        )

    def facet_range(
        self,
        query: str,
        metadata: DataFrame,
        col: str,
        ranges: list[tuple],
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Range aggregation over the FULL match set (Elasticsearch
        ``range``): user-defined half-open buckets ``(name, lo, hi)`` —
        ``lo <= v < hi``, ``None`` = unbounded — over a numeric column.
        ES semantics: buckets MAY overlap (a doc lands in every bucket
        containing it) and every requested bucket is returned even when
        empty, so this is NOT a groupBy: one conditional-sum hash
        aggregation computes all buckets in a single pass over the match
        set (no explode, no per-bucket job). Returns DataFrame[bucket, n]
        with exactly ``len(ranges)`` rows."""
        if not ranges:
            raise ValueError("range aggregation needs at least one bucket")
        names = [name for name, _, _ in ranges]
        if len(set(names)) != len(names):
            raise ValueError("range bucket names must be unique")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", col), "doc_id")
        aggs = []
        for name, lo, hi in ranges:
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col(col) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(col) < F.lit(hi))
            aggs.append(
                F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))
                .cast("long").alias(name)
            )
        return self._unpivot_counts(j.agg(*aggs), names, "bucket")

    def facet_filters(
        self,
        query: str,
        metadata: DataFrame,
        filters: dict[str, str],
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Filters aggregation over the FULL match set (Elasticsearch
        ``filters``): one named bucket per SQL boolean expression over the
        metadata columns; a doc counts toward EVERY filter it satisfies
        (buckets are independent, not partitioning). All buckets evaluate
        in one conditional-sum hash aggregation — single pass, empty
        buckets kept at n=0 like ES. Returns DataFrame[filter, n]."""
        if not filters:
            raise ValueError("filters aggregation needs at least one filter")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata, "doc_id")
        aggs = [
            F.coalesce(F.sum(F.when(F.expr(expr), 1)), F.lit(0))
            .cast("long").alias(name)
            for name, expr in filters.items()
        ]
        return self._unpivot_counts(j.agg(*aggs), list(filters), "filter")

    def facet_rare_terms(
        self,
        query: str,
        metadata: DataFrame,
        col: str,
        max_doc_count: int = 1,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Rare-terms aggregation over the FULL match set (Elasticsearch
        ``rare_terms``): the LONG-TAIL buckets a top-n terms facet
        structurally cannot surface — values appearing in at most
        ``max_doc_count`` matched docs. ES approximates with a CuckooFilter
        to bound memory; here the exact hash aggregation (groupBy + count +
        filter) is itself distributed and the post-filter output is by
        definition the tail, so exactness costs one shuffle and returns a
        bounded result. Returns DataFrame[col, n]."""
        if max_doc_count < 1:
            raise ValueError("max_doc_count must be >= 1")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        return (
            m.join(metadata.select("doc_id", col), "doc_id")
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_doc_count)
        )

    def facet_adjacency_matrix(
        self,
        query: str,
        metadata: DataFrame,
        filters: dict[str, str],
        sep: str = "&",
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Adjacency-matrix aggregation over the FULL match set
        (Elasticsearch ``adjacency_matrix``): named filter expressions →
        one bucket per filter plus one per PAIR intersection (key
        ``a&b``, names in sorted order), empty intersections omitted —
        the co-occurrence / graph-edge aggregation. All n(n+1)/2 buckets
        evaluate as conditional sums in ONE hash aggregation pass (ES
        caps n at 100 for the same quadratic-bucket reason; enforced
        here too). Returns DataFrame[key, n]."""
        if not filters:
            raise ValueError("adjacency_matrix needs at least one filter")
        if len(filters) > 100:
            raise ValueError("adjacency_matrix is quadratic in filters; >100 refused")
        names = sorted(filters)
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata, "doc_id")
        aggs, keys = [], []
        for i, a in enumerate(names):
            for b_ in names[i:]:
                key = a if a == b_ else f"{a}{sep}{b_}"
                cond = F.expr(filters[a]) & F.expr(filters[b_])
                aggs.append(
                    F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))
                    .cast("long").alias(key)
                )
                keys.append(key)
        out = self._unpivot_counts(j.agg(*aggs), keys, "key")
        return out.filter(F.col("n") > 0)

    def facet_matrix_stats(
        self,
        query: str,
        metadata: DataFrame,
        cols: list[str],
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Matrix-stats aggregation over the FULL match set (Elasticsearch
        ``matrix_stats``): pairwise sample covariance and Pearson
        correlation across numeric fields, plus per-field means — one row
        per unordered field pair (field_a <= field_b; the diagonal row
        carries the field's variance as its covariance and correlation 1).
        Spark's ``covar_samp``/``corr`` are single-pass distributed
        moment aggregates (map-side partials, mergeable), so the whole
        matrix is one hash aggregation however large the match set.
        Returns DataFrame[field_a, field_b, n, mean_a, mean_b,
        covariance, correlation]."""
        if len(cols) < 2:
            raise ValueError("matrix_stats needs at least two columns")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", *cols), "doc_id")
        aggs = [F.count(F.lit(1)).cast("long").alias("n")]
        for c in cols:
            aggs.append(F.avg(c).alias(f"mean_{c}"))
        pairs = [(a, b_) for i, a in enumerate(cols) for b_ in cols[i:]]
        for a, b_ in pairs:
            aggs.append(F.covar_samp(a, b_).alias(f"cov_{a}_{b_}"))
            aggs.append(F.corr(a, b_).alias(f"cor_{a}_{b_}"))
        row = j.agg(*aggs)
        # one agg row → pair rows via a single explode (NOT a union of
        # selects, which would re-run the aggregation once per pair)
        pair_structs = F.array(*[
            F.struct(
                F.lit(a).alias("field_a"),
                F.lit(b_).alias("field_b"),
                F.col("n").alias("n"),
                F.col(f"mean_{a}").alias("mean_a"),
                F.col(f"mean_{b_}").alias("mean_b"),
                F.col(f"cov_{a}_{b_}").alias("covariance"),
                F.col(f"cor_{a}_{b_}").alias("correlation"),
            )
            for a, b_ in pairs
        ])
        return row.select(F.explode(pair_structs).alias("s")).select("s.*")

    def diversified_sampler(
        self,
        query: str,
        metadata: DataFrame,
        field: str,
        max_docs_per_value: int = 1,
        shard_size: int = 100,
        doc_filter=None,
        round_dp: int | None = None,
    ) -> DataFrame:
        """Elasticsearch ``diversified_sampler`` aggregation: a
        best-scoring SAMPLE of the match set with a de-bias cap — at most
        ``max_docs_per_value`` docs per distinct ``field`` value, then the
        top ``shard_size`` of the survivors by score. Feeds downstream
        aggregations (significant_terms etc.) so one over-represented host
        or repo can't dominate what they see.

        Shape: full scored match set (``scored_docs``, distributed) ⋈
        metadata on doc_id, ONE window per field value for the cap (the
        shuffle partitions by ``field``; skew = a single hot value — at
        100 TB pre-aggregate such values or salt the window), then a
        global TakeOrderedAndProject for the sample cut. Scores round at
        ``round_dp`` BEFORE ranking so the cap and cut are reproducible
        cross-engine. Returns DataFrame[doc_id, score, <field>]."""
        from pyspark.sql import Window

        scored = self.scored_docs(query, doc_filter)
        if round_dp is not None:
            scored = scored.select(
                "doc_id", F.round("score", round_dp).alias("score")
            )
        j = scored.join(metadata.select("doc_id", field), "doc_id")
        w = Window.partitionBy(field).orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            j.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_docs_per_value)
            .drop("_rn")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(shard_size)
        )

    def facet_weighted_avg(
        self,
        query: str,
        metadata: DataFrame,
        value_col: str,
        weight_col,
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``weighted_avg`` aggregation over the FULL match
        set: Σ(value·weight)/Σ(weight). ``weight_col`` is a column name or
        an arbitrary Column expression (ES allows a script weight — the
        expression form is that, JVM-side). One hash aggregation with
        map-side partials over matched ids ⋈ metadata, the same
        distributed shape as ``facet_stats``. Returns
        DataFrame[(by,)? n, weighted_avg]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
        j = m.join(metadata, "doc_id").select(
            *( [by] if by else [] ),
            F.col(value_col).cast("double").alias("_v"),
            w.cast("double").alias("_w"),
        )
        aggs = [
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("_v") * F.col("_w")) / F.sum("_w")).alias(
                "weighted_avg"
            ),
        ]
        return j.groupBy(by).agg(*aggs) if by else j.agg(*aggs)

    def facet_boxplot(
        self,
        query: str,
        metadata: DataFrame,
        stat_col: str,
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``boxplot`` aggregation over the FULL match set:
        min, q1, q2 (median), q3, max plus the derived IQR. EXACT
        PERCENTILE_CONT quartiles (same contract and trade-off note as
        ``facet_percentiles``: swap ``F.percentile_approx`` in at true
        100 TB match-set scale — the call shape is identical and the
        sketch merges map-side). One distributed aggregation. Returns
        DataFrame[(by,)? n, min, q1, q2, q3, max, iqr]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", stat_col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        c = F.col(stat_col)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.min(c).alias("min"),
            F.percentile(c, F.lit(0.25)).alias("q1"),
            F.percentile(c, F.lit(0.5)).alias("q2"),
            F.percentile(c, F.lit(0.75)).alias("q3"),
            F.max(c).alias("max"),
            (
                F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25))
            ).alias("iqr"),
        ]
        return j.groupBy(by).agg(*aggs) if by else j.agg(*aggs)

    def facet_median_absolute_deviation(
        self,
        query: str,
        metadata: DataFrame,
        stat_col: str,
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``median_absolute_deviation`` over the FULL match
        set: median(|x − median(x)|), the robust dispersion measure. Two
        distributed passes by necessity (the inner median must exist
        before deviations do): pass 1 aggregates the per-group exact
        median, pass 2 re-joins it (broadcast — it is |groups| rows) and
        takes the median of absolute deviations. ES computes this on a
        t-digest sketch in one pass; exactness is the oracle contract
        here, and the same ``percentile_approx`` swap applies at scale.
        Returns DataFrame[(by,)? n, mad]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", stat_col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        c = F.col(stat_col)
        if by:
            med = j.groupBy(by).agg(F.percentile(c, F.lit(0.5)).alias("_med"))
            j2 = j.join(F.broadcast(med), by)
        else:
            med = j.agg(F.percentile(c, F.lit(0.5)).alias("_med"))
            j2 = j.crossJoin(F.broadcast(med))
        dev = F.abs(c.cast("double") - F.col("_med"))
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.percentile(dev, F.lit(0.5)).alias("mad"),
        ]
        return j2.groupBy(by).agg(*aggs) if by else j2.agg(*aggs)

    def facet_string_stats(
        self,
        query: str,
        metadata: DataFrame,
        str_col: str,
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``string_stats`` over the FULL match set: count,
        min/max/avg string length, and the Shannon entropy (bits) of the
        CHARACTER distribution pooled across all matched values — ES's
        ``show_distribution`` entropy definition. Lengths are one hash
        aggregation; entropy needs the per-character counts, computed by
        exploding characters (a narrow generate, no extra shuffle beyond
        its own aggregation) and folding −Σ p·log2 p. Both halves stay
        map-side-combined; the join that reunites them moves |groups|
        rows. Returns DataFrame[(by,)? n, min_length, max_length,
        avg_length, entropy]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        cols = ["doc_id", str_col] + ([by] if by else [])
        j = m.join(metadata.select(*cols), "doc_id")
        c = F.col(str_col)
        keys = [by] if by else []
        lens = j.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.length(c)).alias("min_length"),
            F.max(F.length(c)).alias("max_length"),
            F.avg(F.length(c)).alias("avg_length"),
        )
        chars = (
            j.select(*keys, F.explode(F.split(c, "")).alias("_ch"))
            .filter(F.col("_ch") != "")
            .groupBy(*keys, "_ch")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        ent = (
            chars.groupBy(*keys)
            .agg(
                F.sum("_cnt").alias("_tot"),
                F.sum(F.col("_cnt") * F.log2("_cnt")).alias("_clog"),
            )
            .select(
                *keys,
                (F.log2("_tot") - F.col("_clog") / F.col("_tot")).alias(
                    "entropy"
                ),
            )
        )
        if by:
            return lens.join(ent, by)
        return lens.crossJoin(ent)

    def facet_top_metrics(
        self,
        query: str,
        metadata: DataFrame,
        sort_col: str,
        metric_cols: list[str],
        size: int = 1,
        ascending: bool = False,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``top_metrics``: the metric column values of the
        ``size`` match-set rows ranked by ``sort_col`` (ties on doc_id
        asc, so the cut is deterministic cross-engine). orderBy+limit →
        TakeOrderedAndProject: per-partition heaps of ``size`` rows, no
        global sort — the same plan shape ``search_sorted`` relies on.
        Returns DataFrame[doc_id, <sort_col>, *metric_cols]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(
            metadata.select("doc_id", sort_col, *metric_cols), "doc_id"
        )
        key = F.asc(sort_col) if ascending else F.desc(sort_col)
        return j.orderBy(key, F.asc("doc_id")).limit(size)

    def facet_t_test(
        self,
        query: str,
        metadata: DataFrame,
        value_col: str,
        group_col: str,
        group_a: str,
        group_b: str,
        by: str | None = None,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``t_test`` aggregation (heteroscedastic/Welch —
        ES's default form) between two filter-defined populations of the
        match set: t = (m_a − m_b) / √(s²_a/n_a + s²_b/n_b) with SAMPLE
        variances. Both populations reduce in ONE hash aggregation using
        conditional aggregates (no second scan, no join); the t statistic
        is pure column arithmetic on the single result row. Welch degrees
        of freedom come back too so a caller can look up the p-value.
        Returns DataFrame[n_a, n_b, mean_a, mean_b, t, df]; with ``by``,
        one row per bucket (the by column leads), like every sibling
        facet."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        meta_cols = ["doc_id", value_col, group_col] + ([by] if by else [])
        j = m.join(metadata.select(*dict.fromkeys(meta_cols)), "doc_id")
        v = F.col(value_col).cast("double")
        in_a = F.col(group_col) == group_a
        in_b = F.col(group_col) == group_b
        agg = (j.groupBy(by) if by else j.groupBy()).agg(
            F.count(F.when(in_a, 1)).alias("n_a"),
            F.count(F.when(in_b, 1)).alias("n_b"),
            F.avg(F.when(in_a, v)).alias("mean_a"),
            F.avg(F.when(in_b, v)).alias("mean_b"),
            F.var_samp(F.when(in_a, v)).alias("_va"),
            F.var_samp(F.when(in_b, v)).alias("_vb"),
        )
        se_a = F.col("_va") / F.col("n_a")
        se_b = F.col("_vb") / F.col("n_b")
        se = se_a + se_b
        t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se)
        dof = (se * se) / (
            se_a * se_a / (F.col("n_a") - 1) + se_b * se_b / (F.col("n_b") - 1)
        )
        out_cols = ([by] if by else []) + [
            "n_a", "n_b", "mean_a", "mean_b",
        ]
        return agg.select(*out_cols, t.alias("t"), dof.alias("df"))

    def _facet_metric_buckets(
        self, query, metadata, by, stat_col, mode, rewriter, doc_filter
    ) -> DataFrame:
        """Shared terms-bucket frame for the bucket-pipeline aggs:
        (by, n, sum, avg) per bucket over the FULL match set — one hash
        aggregation, map-side partials."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", stat_col, by), "doc_id")
        return j.groupBy(by).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(stat_col).alias("sum"),
            F.avg(stat_col).alias("avg"),
        )

    def facet_bucket_selector(
        self,
        query: str,
        metadata: DataFrame,
        by: str,
        stat_col: str,
        having,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``bucket_selector`` pipeline aggregation: keep only
        the terms buckets whose aggregated metrics satisfy ``having`` — a
        Column or SQL string over the bucket frame's ``n``/``sum``/``avg``
        (ES's bucket_path script, JVM-side). The filter runs on the
        |buckets|-row aggregated frame, so it costs nothing at any corpus
        size. Returns DataFrame[by, n, sum, avg] for surviving buckets."""
        b = self._facet_metric_buckets(
            query, metadata, by, stat_col, mode, rewriter, doc_filter
        )
        pred = F.expr(having) if isinstance(having, str) else having
        return b.filter(pred)

    def facet_bucket_sort(
        self,
        query: str,
        metadata: DataFrame,
        by: str,
        stat_col: str,
        sort_by: str = "avg",
        ascending: bool = False,
        size: int = 10,
        from_: int = 0,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``bucket_sort`` pipeline aggregation: order the
        terms buckets by one of their metrics (``n``/``sum``/``avg``) and
        truncate with from/size pagination (ties on the bucket key asc, so
        the page cut is deterministic cross-engine). The rank window runs
        on the aggregated |buckets|-row frame — single-partition there is
        correct by construction, exactly like the date-histogram pipeline.
        Returns DataFrame[by, n, sum, avg, bucket_rank]."""
        if sort_by not in ("n", "sum", "avg"):
            raise ValueError(f"sort_by must be n/sum/avg, got {sort_by!r}")
        b = self._facet_metric_buckets(
            query, metadata, by, stat_col, mode, rewriter, doc_filter
        )
        key = F.asc(sort_by) if ascending else F.desc(sort_by)
        w = Window.orderBy(key, F.asc(by))
        ranked = b.withColumn("bucket_rank", F.row_number().over(w))
        return ranked.filter(
            (F.col("bucket_rank") > from_) & (F.col("bucket_rank") <= from_ + size)
        )

    def facet_geo_bounds(
        self,
        query: str,
        geo_meta: DataFrame,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``geo_bounds``: the bounding box of the match
        set's points — top-left (max lat, min lon) / bottom-right (min lat,
        max lon). min/max only, so the result is exactly reproducible in
        any engine (no fold-order sensitivity). One aggregation. Returns
        DataFrame[n, top, left, bottom, right]."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(geo_meta.select("doc_id", "lat", "lon"), "doc_id")
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("lat").alias("top"),
            F.min("lon").alias("left"),
            F.min("lat").alias("bottom"),
            F.max("lon").alias("right"),
        )

    def facet_geo_centroid(
        self,
        query: str,
        geo_meta: DataFrame,
        round_dp: int = 5,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``geo_centroid``: arithmetic mean lat/lon of the
        match set's points (ES's definition — a flat average, not a
        spherical centroid; same deliberate simplification). Returns
        DataFrame[n, lat, lon] with the means rounded for cross-engine
        hashing."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(geo_meta.select("doc_id", "lat", "lon"), "doc_id")
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("lat"), round_dp).alias("lat"),
            F.round(F.avg("lon"), round_dp).alias("lon"),
        )

    def facet_date_range(
        self,
        query: str,
        metadata: DataFrame,
        ts_col: str,
        ranges: list[tuple[str, str | None, str | None]],
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``date_range`` aggregation: doc counts per named
        range [(key, from, to)] with ES's from-INclusive / to-EXclusive
        bounds; open ends via None. All ranges reduce in ONE conditional
        aggregation pass (no per-range scan); empty ranges still return
        (count 0), matching ES. Returns DataFrame[range_key, n]."""
        if not ranges:
            raise ValueError("ranges must hold ≥1 (key, from, to) triple")
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", ts_col), "doc_id")
        ts = F.col(ts_col)
        aggs = []
        for key, lo, hi in ranges:
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (ts >= F.lit(lo).cast("timestamp"))
            if hi is not None:
                cond = cond & (ts < F.lit(hi).cast("timestamp"))
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(key))
        wide = j.agg(*aggs)
        stack = ", ".join(f"'{k}', {k}" for k, _, _ in ranges)
        return wide.selectExpr(
            f"stack({len(ranges)}, {stack}) AS (range_key, n)"
        )

    AUTO_HIST_LADDER = (
        1, 10, 60, 300, 1800, 3600, 10800, 43200,
        86400, 604800, 2592000, 31536000,
    )

    def facet_auto_date_histogram(
        self,
        query: str,
        metadata: DataFrame,
        ts_col: str,
        target_buckets: int = 10,
        mode: str = "or",
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Elasticsearch ``auto_date_histogram``: pick the smallest interval
        from a fixed ladder (1s…1y; ES uses calendar steps — fixed seconds
        here, a documented simplification that keeps bucket edges exactly
        reproducible in SQL) such that the match set's time span fits in
        ``target_buckets`` buckets, then histogram on it. The span probe is
        min/max epoch-seconds (exact integers — no fold-order hazard); it
        shares one aggregation with nothing else, so the op is two jobs
        total. Returns DataFrame[bucket, n, interval_sec] with the bucket
        as the epoch-second lower edge."""
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        j = m.join(metadata.select("doc_id", ts_col), "doc_id").select(
            F.unix_timestamp(F.col(ts_col)).alias("_epoch")
        )
        lohi = j.agg(F.min("_epoch").alias("lo"), F.max("_epoch").alias("hi")).collect()[0]
        if lohi["lo"] is None:
            raise ValueError("no matching docs with a timestamp")
        span = int(lohi["hi"]) - int(lohi["lo"])
        interval = next(
            (s for s in self.AUTO_HIST_LADDER if span // s + 1 <= target_buckets),
            self.AUTO_HIST_LADDER[-1],
        )
        bucket = (F.floor(F.col("_epoch") / interval) * interval).cast("long")
        return (
            j.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bucket", "n", F.lit(interval).cast("long").alias("interval_sec"))
        )

    def stats(self) -> dict:
        """Index statistics (ES ``_stats`` / Lucene SegmentInfos analogue),
        served ENTIRELY from driver-side metadata — meta.json, the
        manifest.jsonl lineage rows, and the cached tombstone arrays. No
        Spark job runs, so this is an O(manifest) control-plane call even
        against a 10^12-doc index. Counts reflect what the build/ingest
        actually committed (manifest rows are the commit points), not a
        recount."""
        from ..index.build import read_manifest

        meta = self.meta
        rows = read_manifest(self.index_dir)
        segs = [r for r in rows if r["kind"] == "segment"]
        epochs = [r for r in rows if r["kind"] == "stream_epoch"]
        compactions = [r for r in rows if r["kind"] == "compaction"]
        dicts = [r for r in rows if r["kind"] == "dictionary"]
        n_blocks = sum(int(r.get("n_blocks") or 0) for r in segs)
        if compactions or epochs:
            # streamed layout: live blocks = last compaction + epochs after it
            start = rows.index(compactions[-1]) + 1 if compactions else 0
            n_blocks = sum(int(r.get("n_blocks") or 0) for r in compactions[-1:])
            n_blocks += sum(
                int(r.get("n_blocks") or 0)
                for r in rows[start:]
                if r["kind"] == "stream_epoch"
            )
        churn = self._churn_stats()
        if churn["tombstone_raw_rows"] <= self.tombstone_limit:
            plain, upd, _wm = self._tombstones() or (None, None, None)
            n_deleted = 0 if plain is None else int(len(plain))
            n_updated = 0 if upd is None else int(len(upd))
            counts_exact = True
        else:
            # over the churn limit, exact distinct counts would need a Spark
            # job (or trigger the fold) — stats stays a control-plane call:
            # report the raw row count (churn dict) and mark inexact
            plain = upd = None
            n_deleted = n_updated = None
            counts_exact = False
        size_bytes = 0
        for root, _dirs, files in os.walk(self.index_dir):
            for f in files:
                try:
                    size_bytes += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return {
            "n_docs": meta.n_docs,
            "avgdl": meta.avgdl,
            "total_len": meta.total_len,
            "n_terms": int(dicts[-1]["n_terms"]) if dicts else None,
            "n_buckets": meta.n_buckets,
            "range_bits": meta.range_bits,
            "n_blocks": n_blocks,
            "n_segments": len(segs),
            "stream_epochs": meta.stream_epochs,
            "n_compactions": len(compactions),
            "has_positions": meta.has_positions,
            "has_source": meta.has_source,
            "analyzer": meta.analyzer,
            "n_deleted": n_deleted,
            "n_updated": n_updated,
            "tombstone_counts_exact": counts_exact,
            "size_bytes": size_bytes,
            **churn,
        }

    def _churn_stats(self) -> dict:
        """Maintenance observability (driver-side metadata only): raw
        tombstone rows, which fold mode the next compaction would use, and
        whether a maintenance fold currently holds the index lock."""
        from ..streaming.ingest import (
            FOLD_CLOSURE_BOUND,
            _tombstone_files,
            _tombstone_row_total,
        )

        raw = _tombstone_row_total(_tombstone_files(self.index_dir))
        return {
            "tombstone_raw_rows": raw,
            "tombstone_limit": self.tombstone_limit,
            "next_fold_mode": "join" if raw > FOLD_CLOSURE_BOUND else "closure",
            "maintenance_locked": os.path.exists(
                os.path.join(self.index_dir, ".maintenance.lock")
            ),
        }

    def _all_blocks(self) -> DataFrame:
        """Unpruned segment scan — every bucket, every term. Input to the
        corpus-wide index ops (``term_vectors`` allow-set decode,
        ``significant_terms``' postings ⋈ match join), which are full-index
        aggregations by definition; per-query search paths stay on
        ``_pruned_blocks``."""
        if self._seg_df is None:
            self._seg_df = self.spark.read.parquet(
                os.path.join(self.index_dir, self.meta.segments_dir)
            )
        return self._seg_df

    def _snapshot_blocks_mask(self, doc_filter=None):
        """(blocks, mask) bound in the ONLY safe order: the segment scan
        FIRST, the tombstone mask second. ``_doc_mask`` may physically fold
        tombstones (auto-compaction past ``tombstone_limit``), after which
        ``self.meta`` refreshes and a late ``_all_blocks()`` would point at
        the POST-fold segments — against which the pre-fold mask's update
        watermarks are invalid (the fold renumbers survivors to epoch 0, so
        a stale "dead iff epoch ≤ wm" rule would kill live docs). Callers
        that need the full scan + a mask MUST go through this helper so the
        ordering invariant lives in one place instead of per-call-site
        convention; the pruned search paths bind ``_pruned_blocks`` before
        their mask for the same reason."""
        blocks = self._all_blocks()
        return blocks, self._doc_mask(doc_filter)

    def term_vectors(self, doc_ids) -> DataFrame:
        """Per-document term vectors straight off the index (Lucene
        ``Fields/TermVectors`` analogue): DataFrame[doc_id, term, tf, dl]
        for the given docs — what the index physically stores about them,
        decoded by the same kernel as ``explain()`` but across ALL terms
        (no query to prune by, so this scans every segment and filters at
        decode time via the allow-set mask). Diagnostic surface sized for
        a handful of docs; at 100 TB the right layout for bulk term-vector
        reads is a doc-major sidecar written at build time (Lucene's .tvd),
        which this engine does not persist — noted, not hidden."""
        from .wand import EXPLAIN_SCHEMA, explain_group

        blocks, mask = self._snapshot_blocks_mask(doc_ids)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return explain_group(pdf, mask)

        return blocks.groupBy("doc_range").applyInPandas(
            run_group, EXPLAIN_SCHEMA
        )

    def search_rerank_maxsim(
        self,
        query: str,
        k: int = 10,
        n_candidates: int = 100,
        dim: int = 8,
    ) -> list[tuple[int, float]]:
        """Retrieve-then-rerank with late interaction (the ColBERT serving
        shape): BM25/WAND retrieves ``n_candidates`` cheaply from the
        index, then MaxSim — Σ over query tokens of the best doc-token
        dot product — re-scores ONLY those candidates from their stored
        term vectors and returns the top ``k``.

        Cost at scale: the first phase is the ordinary pruned index read;
        the rerank decodes term vectors for a candidate-bounded doc set
        and computes |q|·|terms(doc)| dots map-side, so the expensive
        interaction model never touches the corpus. Embeddings are the
        deterministic md5 stand-in (see ops/similarity._hash_emb_expr for
        the one-expression real-encoder swap point)."""
        from ..ops.similarity import maxsim_topk

        hits = self.search(query, k=n_candidates)
        if not hits:
            return []
        terms = self._analyze(query)  # same analyzer as the index
        tv = self.term_vectors([d for d, _ in hits])
        out = maxsim_topk(tv, terms, k=k, dim=dim)
        return [(int(r["doc_id"]), float(r["score"])) for r in out.collect()]

    _RESCORE_MODES = ("total", "multiply", "avg", "max", "min")

    def rescore(
        self,
        query: str,
        rescore_query: str,
        k: int = 10,
        window_size: int = 100,
        query_weight: float = 1.0,
        rescore_query_weight: float = 1.0,
        score_mode: str = "total",
    ) -> list[tuple[int, float]]:
        """Two-phase rescoring (the Elasticsearch ``rescore`` API): the
        primary query retrieves its top ``window_size`` through the normal
        pruned/WAND path, then the rescore query is scored ONLY over that
        window (``doc_filter`` — the allow-set reaches the decode kernels,
        so phase 2 touches a candidate-bounded slice of the index, never
        the corpus) and the two scores combine per ``score_mode``:

          total     qw·primary + rw·secondary      (ES default)
          multiply  (qw·primary) · (rw·secondary)
          avg/max/min over the two weighted scores

        ES semantics kept: docs OUTSIDE the window are gone (rescoring
        never resurrects rank > window_size); a window doc the rescore
        query does NOT match keeps ``qw·primary`` under every mode (the
        secondary leg simply isn't there to combine — pinned convention,
        matching ES's total mode; ES leaves the non-matching case
        undefined for the other modes).

        The combine runs driver-side over ≤ window_size rows — same
        bounded-candidate discipline as ``mmr_rerank``/``glove`` rerank;
        both phases are ordinary distributed searches."""
        if score_mode not in self._RESCORE_MODES:
            raise ValueError(f"score_mode must be one of {self._RESCORE_MODES}")
        if window_size < k:
            raise ValueError("window_size must be >= k")
        primary = self.search(query, k=window_size)
        if not primary:
            return []
        ids = [d for d, _ in primary]
        secondary = dict(
            self.search(
                rescore_query, k=window_size, doc_filter=ids, use_wand=False
            )
        )
        qw, rw = float(query_weight), float(rescore_query_weight)
        out = []
        for d, p in primary:
            wp = qw * p
            if d in secondary:
                ws = rw * secondary[d]
                if score_mode == "total":
                    s = wp + ws
                elif score_mode == "multiply":
                    s = wp * ws
                elif score_mode == "avg":
                    s = (wp + ws) / 2.0
                elif score_mode == "max":
                    s = max(wp, ws)
                else:
                    s = min(wp, ws)
            else:
                s = wp
            out.append((d, s))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]

    def significant_terms(
        self,
        query: str,
        top_n: int = 20,
        mode: str = "or",
        min_fg: int = 1,
        rewriter=None,
        doc_filter=None,
    ) -> DataFrame:
        """Significant-terms aggregation (Elasticsearch
        ``significant_terms`` with the JLH heuristic): terms overrepresented
        in the query's match set vs the whole index. Foreground df comes
        from postings ⋈ matched-docs — a single shuffle join on doc_id with
        map-side-combine counting (the scale-honest shape without a stored
        doc-major term-vectors layout); background df and N come free from
        the dictionary/meta. Background counts keep Lucene semantics
        (deleted docs count until compaction); the foreground side excludes
        tombstoned docs because the match set does.

        JLH score = (fg% − bg%) · (fg% / bg%), rounded to 6 dp BEFORE
        ordering so top-n selection is reproducible across float
        implementations (ties break term-asc). Returns
        DataFrame[term, fg_df, bg_df, score], score desc."""
        from .wand import EXPLAIN_SCHEMA, explain_group

        out_schema = "term string, fg_df long, bg_df long, score double"
        m = self.matching_docs(query, mode, rewriter, doc_filter)
        fg_total = m.count()
        if fg_total == 0:
            return self.spark.createDataFrame([], out_schema)
        # Snapshot EVERY index-derived input — n, the background dictionary,
        # the segment scan — BEFORE the mask build: _doc_mask may auto-fold,
        # after which self.meta refreshes and a late _load_dict()/meta read
        # would mix post-fold background stats (survivors only) with the
        # pre-fold foreground/n, skewing bgp per term. One consistent
        # generation, the one the mask was built against.
        n = float(self.meta.n_docs)
        bg = self._load_dict().select("term", F.col("df").alias("bg_df"))
        blocks, mask = self._snapshot_blocks_mask(None)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return explain_group(pdf, mask)

        pairs = (
            blocks
            .groupBy("doc_range")
            .applyInPandas(run_group, EXPLAIN_SCHEMA)
            .select("doc_id", "term")
        )
        fg = (
            pairs.join(m, "doc_id")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("fg_df"))
        )
        fgp = F.col("fg_df") / F.lit(float(fg_total))
        bgp = F.col("bg_df") / F.lit(n)
        return (
            fg.join(bg, "term")
            .filter(F.col("fg_df") >= min_fg)
            .withColumn("score", F.round((fgp - bgp) * (fgp / bgp), 6))
            .orderBy(F.desc("score"), F.asc("term"))
            .limit(top_n)
        )

    # -- score explain ---------------------------------------------------------
    def explain(self, query: str, doc_ids, rewriter=None) -> DataFrame:
        """Per-(doc, term) BM25 score breakdown for the given docs (Lucene
        ``explain()`` analogue): tf and dl come straight off the decoded
        postings (what the index physically scored), df/idf from the
        dictionary, and the saturation + contribution arithmetic is a JVM
        expression — summing ``contribution`` per doc reproduces ``search``
        scores exactly. Returns DataFrame[doc_id, term, tf, dl, df, idf,
        contribution]. Diagnostic surface: sized for a handful of docs (the
        allow-set mask), not a full-corpus scan."""
        from .wand import EXPLAIN_SCHEMA, explain_group

        dict_rows = self._resolve_terms(query, rewriter)
        raw_empty = self.spark.createDataFrame(
            [], EXPLAIN_SCHEMA + ", df long, idf double, contribution double"
        )
        if not dict_rows:
            return raw_empty
        terms = sorted({r["term"] for r in dict_rows})
        buckets = sorted({int(r["bucket"]) for r in dict_rows})
        blocks = self._pruned_blocks(buckets, terms)
        mask = self._doc_mask(doc_ids)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return explain_group(pdf, mask)

        raw = blocks.groupBy("doc_range").applyInPandas(run_group, EXPLAIN_SCHEMA)
        meta = self.meta
        dict_df = self.spark.createDataFrame(
            [(r["term"], int(r["df"]), float(r["idf"])) for r in dict_rows],
            "term string, df long, idf double",
        )
        u = (F.col("tf") * (meta.k1 + 1.0)) / (
            F.col("tf")
            + meta.k1 * (1.0 - meta.b + meta.b * F.col("dl") / meta.avgdl)
        )
        return raw.join(F.broadcast(dict_df), "term").select(
            "doc_id",
            "term",
            "tf",
            "dl",
            "df",
            "idf",
            (F.col("idf") * u).alias("contribution"),
        )

    # -- more-like-this --------------------------------------------------------
    def more_like_this(
        self,
        text: str,
        k: int = 100,
        max_terms: int = 25,
        exclude_doc_id: int | None = None,
        doc_filter=None,
        use_wand: bool = True,
    ) -> list[tuple[int, float]]:
        """Similar-document retrieval (Lucene ``MoreLikeThis`` analogue):
        tokenize the source text (one doc — driver-side is the right place),
        pick its ``max_terms`` most characteristic terms by tf·idf (rounded
        to 6 dp before ordering so the selection is reproducible across
        float implementations; ties break term-asc), then run a BM25 OR over
        the selection. ``exclude_doc_id`` drops the source document itself
        from the results (the standard MLT contract). The tf·idf selection
        costs one dictionary lookup (term-cached); the search is the normal
        pruned segment path."""
        from collections import Counter


        tf = Counter(self._analyze(text))
        if not tf:
            return []
        rows = self._resolve_terms(sorted(tf))
        scored = sorted(
            (
                (-round(tf[r["term"]] * float(r["idf"]), 6), r["term"])
                for r in rows
            ),
        )
        selected = [(t, 1.0) for _, t in scored[:max_terms]]
        if not selected:
            return []
        extra = 1 if exclude_doc_id is not None else 0
        hits = self.search(
            [t for t, _ in selected],
            k=k + extra,
            use_wand=use_wand,
            doc_filter=doc_filter,
            rewriter=lambda _qterms: selected,
        )
        if exclude_doc_id is not None:
            hits = [(d, s) for d, s in hits if d != exclude_doc_id]
        return hits[:k]

    def more_like_this_by_id(
        self,
        doc_id: int,
        k: int = 100,
        max_terms: int = 25,
        text_col: str | None = None,
        doc_filter=None,
        use_wand: bool = True,
    ) -> list[tuple[int, float]]:
        """MoreLikeThis addressed by STORED doc id (ES ``like: [{"_id"}]``):
        point-fetch the source doc's text from the doc store (pruned to its
        doc_part partition — one partition's files, not the corpus), then
        the ordinary ``more_like_this`` with the source excluded. Requires
        a ``store_source=True`` build; ``text_col`` defaults to the column
        the index was built from."""
        meta = self.meta
        if not meta.has_source:
            raise ValueError(
                "more_like_this_by_id needs the doc store — build with "
                "store_source=True (or pass the text to more_like_this)"
            )
        col = text_col or meta.source_text_col
        rows = self.fetch([doc_id]).select(col).collect()
        if not rows:
            return []
        return self.more_like_this(
            rows[0][0] or "",
            k=k,
            max_terms=max_terms,
            exclude_doc_id=doc_id,
            doc_filter=doc_filter,
            use_wand=use_wand,
        )

    def search_df(self, query: str, k: int = 100, **kwargs) -> DataFrame:
        rows = self.search(query, k, **kwargs)
        return self.spark.createDataFrame(
            [(int(d), float(s)) for d, s in rows] or [], RESULT_SCHEMA
        )
