"""Sharded scatter-gather serving: N independent shard indexes queried as
one logical index (the multi-node layout of every production engine —
Elasticsearch shards, Solr cores, Lucene's per-node indexes).

Reference parity note: the reference (GuyShimony/SearchEngine) is a
single-process engine with one in-memory index; sharding is the piece it
cannot do and the piece a 100 TB corpus REQUIRES — no single machine holds
the postings. This module keeps each shard a plain ``SearchEngine`` index
(built, compacted, deleted-from independently) and makes cross-shard
results EXACTLY equal to a single index over the union corpus:

  * routing: ``pmod(xxhash64(doc_id), n_shards)`` — content-independent,
    uniform under any id distribution, and reproducible from the id alone
    (a router needs no lookup table).
  * scoring: per-shard idf/avgdl are NOT comparable across shards (a term
    rare in one shard and common in another would rank differently), so
    the gather phase first aggregates GLOBAL statistics — N and Σdoc_len
    from the shard metas (exact ints), df per query term summed across
    shard dictionaries (term-cached, broadcast-small) — and every shard
    scores under them via ``search(global_stats=...)``. This is
    Elasticsearch's DFS_QUERY_THEN_FETCH, which it makes optional only
    because big uniform corpora hide the skew; we make it the only mode
    because exactness is the contract here (rank identity to the
    single-index build is pytest-enforced).
  * block-max safety: shard blocks store max_u computed under SHARD
    avgdl; scoring under global avgdl rebinds them avgdl-robustly
    (u(max_tf, min_dl, global avgdl) ≥ any true u in the block), so WAND
    pruning stays exact — same mechanism the streamed index uses.
  * merge: per-shard top-k lists merge driver-side on (score desc,
    doc_id asc) — k·n_shards tuples, never the match sets.

At cluster scale each shard's segment parquet lives under its own prefix,
so shard scans are independent jobs with no cross-shard shuffle; the only
cross-shard traffic is |terms| df lookups and k results per shard.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import SearchEngine


def shard_of(id_col, n_shards: int):
    """Routing expression: pmod(xxhash64(doc_id), n_shards) — content-
    independent and deterministic across parallelism levels (computed from
    the id alone, JVM-side), uniform under any id distribution."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_shards))


class ShardedEngine:
    """N shard indexes behind the single-index query API (search /
    search_batch), rank- and score-identical to one index over the union
    corpus (see module docstring)."""

    def __init__(self, spark: SparkSession, shard_dirs: list[str],
                 routed: bool = True):
        if not shard_dirs:
            raise ValueError("need at least one shard dir")
        self.spark = spark
        self.shards = [SearchEngine(spark, d) for d in shard_dirs]
        # routed=True: members are hash-routed shards of ONE corpus (built
        # by ``build``) — id-addressed maintenance (append/update/delete)
        # and point fetch can route. routed=False (``alias``): members are
        # arbitrary independent indexes; only the scatter-gather query
        # surface applies.
        self.routed = routed

    @classmethod
    def open(cls, spark: SparkSession, base_dir: str) -> "ShardedEngine":
        """Open a layout written by ``build``: base_dir/shard-<i>."""
        # NUMERIC order: a lexicographic sort puts shard-10 before shard-2,
        # and with >=10 shards the list index no longer matches the hash
        # routing — deletes/appends/fetches would target the wrong shard
        dirs = [
            os.path.join(base_dir, d)
            for d in sorted(
                (d for d in os.listdir(base_dir) if d.startswith("shard-")),
                key=lambda d: int(d.split("-", 1)[1]),
            )
        ]
        return cls(spark, dirs)

    @classmethod
    def alias(cls, spark: SparkSession, index_dirs: list[str]) -> "ShardedEngine":
        """ES index alias / multi-index search: ARBITRARY independent
        indexes (time-partitioned, per-tenant, per-language) behind the one
        scatter-gather query surface. Search correctness needs only that
        doc ids be disjoint across members — the gather phase's global
        statistics and driver merge are routing-agnostic — so the full
        query surface (search / batch / phrase / NEAR / qs / bool /
        wildcard / fuzzy / regexp / suggest / snippets / stats) works
        unchanged and stays rank+score identical to one index over the
        union corpus. What does NOT apply: hash-routed maintenance
        (``append``/``update``/``delete`` raise — address the member
        engine directly) and routed point fetch (``fetch`` falls back to
        asking every member, which prunes to the requested ids' partitions
        per member anyway). Members must share an analyzer (the query is
        analyzed once)."""
        eng = cls(spark, list(index_dirs), routed=False)
        analyzers = {s.meta.analyzer for s in eng.shards}
        if len(analyzers) > 1:
            raise ValueError(
                f"alias members mix analyzers {sorted(analyzers)} — queries "
                "are analyzed once, so members must agree"
            )
        return eng

    def _require_routed(self, what: str) -> None:
        if not self.routed:
            raise ValueError(
                f"{what} routes by the build's doc-id hash, which an alias's "
                "independent members don't share — call the owning member "
                "engine directly"
            )

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        base_dir: str,
        n_shards: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        epoch_layout: bool = False,
        single_pass: bool = True,
        **build_kw,
    ) -> "ShardedEngine":
        """Route the corpus by hash and build one independent index per
        shard. Shard builds run sequentially here (one Spark app — each
        build already uses every core); on a real cluster they are
        embarrassingly parallel across driver processes because nothing is
        shared but the input table.

        ``single_pass=True`` (default) scans the input corpus ONCE: the
        routed (id, text) projection is staged to a parquet dir
        partitioned by ``_shard=<s>``, and each shard build reads only its
        own directory partition (partition pruning on the path column).
        The naive alternative — ``single_pass=False``, kept for the
        identity test — filters the raw corpus per shard, i.e. n_shards
        full scans of the input table; at corpus scale the staging write
        is one shuffle of the projection vs N scans of everything. The
        staging write is salted to ``files_per_shard ≈ parallelism /
        n_shards`` files per shard (parallel write, no small-file
        explosion), and the staging dir is removed after the builds.

        ``epoch_layout=True`` creates each shard as epoch 0 of the
        streaming/append layout instead of the canonical batch layout —
        required if the sharded index will take ``append``/``update``
        later (a batch layout pins its partition scheme; the epoch commit
        protocol refuses to mix into it). Rank-identity between the two
        layouts is the streaming suite's core invariant."""
        if epoch_layout and build_kw.get("store_source"):
            raise ValueError(
                "store_source is not supported with epoch_layout=True "
                "(epoch appends have no doc-store stage)"
            )
        routed = None
        staging = None
        if single_pass and n_shards > 1:
            staging = os.path.join(base_dir, "_staging")
            fps = max(1, spark.sparkContext.defaultParallelism // n_shards)
            salt = F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), F.lit(fps))
            # the doc store persists EVERY source column — stage them all
            # when store_source rides along (the index itself only needs
            # id+text, so the lean projection stays the default)
            stage_cols = (
                corpus.columns if build_kw.get("store_source")
                else [id_col, text_col]
            )
            (
                corpus.select(*stage_cols)
                .withColumn("_shard", shard_of(F.col(id_col), n_shards))
                .repartition(n_shards * fps, F.col("_shard"), salt)
                .write.partitionBy("_shard")
                .mode("overwrite")
                .parquet(staging)
            )
            routed = spark.read.parquet(staging)
        dirs = []
        for s in range(n_shards):
            d = os.path.join(base_dir, f"shard-{s}")
            if routed is not None:
                sub = routed.filter(F.col("_shard") == s).drop("_shard")
            else:
                sub = corpus.filter(shard_of(F.col(id_col), n_shards) == s)
            if epoch_layout:
                from ..streaming.ingest import append_docs

                append_docs(sub, d, id_col=id_col, text_col=text_col, **build_kw)
            else:
                SearchEngine(spark, d).build_index_from_df(
                    sub, id_col=id_col, text_col=text_col, **build_kw
                )
            dirs.append(d)
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
        return cls(spark, dirs)

    # -- maintenance routing -------------------------------------------------
    def append(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """Route a document batch to its shards and epoch-append per shard
        (each shard keeps its own Lucene-style commit protocol — the
        sharded layout adds only the hash routing). Layout params come
        from each shard's meta, so appends always match the shard's build.
        Returns total docs appended."""
        self._require_routed("append")
        from ..streaming.ingest import append_docs

        n = len(self.shards)
        total = 0
        docs = docs.persist()  # n_shards routed filters + append_docs' own
        # aggregation all scan the batch — unpersisted it tokenized twice
        # per shard
        for s, eng in enumerate(self.shards):
            sub = docs.filter(shard_of(F.col(id_col), n) == s)
            n_sub = sub.count()
            if not n_sub:
                continue
            m = eng.meta
            append_docs(  # returns the epoch id; we report docs routed
                sub, eng.index_dir, id_col=id_col, text_col=text_col,
                n_buckets=m.n_buckets, range_bits=m.range_bits,
                with_positions=m.has_positions,
            )
            eng.refresh()
            total += n_sub
        docs.unpersist()
        return total

    def _route_ids(self, doc_ids) -> list[list[int]]:
        """Partition ids by shard with the SAME JVM xxhash64 expression the
        build used (one tiny job over |ids| rows — never recompute the
        routing in Python, a drifting twin would corrupt deletes)."""
        n = len(self.shards)
        ids_df = self.spark.createDataFrame(
            [(int(d),) for d in doc_ids], "doc_id long"
        )
        rows = ids_df.select(
            "doc_id", shard_of(F.col("doc_id"), n).alias("s")
        ).collect()
        out: list[list[int]] = [[] for _ in range(n)]
        for r in rows:
            out[int(r["s"])].append(int(r["doc_id"]))
        return out

    def delete(self, doc_ids) -> int:
        """Tombstone-delete across shards: ids route to their owning shard
        (O(|ids|) job + |ids| tombstone rows total — NOT broadcast to every
        shard, which would multiply tombstone state by N). A single-column
        DataFrame routes and writes fully DISTRIBUTED (per-shard filter on
        the same JVM hash the build used → each shard's distributed
        tombstone append) — a web-scale id set never touches the driver;
        an explicit id list is the bounded-closure path."""
        self._require_routed("delete")
        if isinstance(doc_ids, DataFrame):
            n = len(self.shards)
            id_col = doc_ids.columns[0]
            ids = doc_ids.select(F.col(id_col).cast("long").alias("doc_id"))
            ids = ids.persist()  # n_shards routed filters scan the batch
            try:
                return sum(
                    eng.delete_docs(
                        ids.filter(shard_of(F.col("doc_id"), n) == s)
                    )
                    for s, eng in enumerate(self.shards)
                )
            finally:
                ids.unpersist()
        doc_ids = list(doc_ids)
        if not doc_ids:
            return 0
        return sum(
            eng.delete_docs(ids) if ids else 0
            for eng, ids in zip(self.shards, self._route_ids(doc_ids))
        )

    def delete_by_query(self, query: str, mode: str = "or") -> int:
        """ES ``_delete_by_query`` across shards: each shard tombstones its
        own match set with a distributed write (boolean matching is
        corpus-stats-free, and routing keeps shard doc sets disjoint, so
        the per-shard match sets union to exactly the global match set)."""
        self._require_routed("delete_by_query")
        return sum(
            eng.delete_by_query(query, mode=mode) for eng in self.shards
        )

    def update(
        self,
        updates: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """In-place update across shards: each shard runs its own
        watermarked tombstone + append pair on its routed slice."""
        self._require_routed("update")
        n = len(self.shards)
        total = 0
        for s, eng in enumerate(self.shards):
            sub = updates.filter(shard_of(F.col(id_col), n) == s)
            if sub.limit(1).count():
                total += eng.update_docs(sub, id_col=id_col, text_col=text_col)
        return total

    def update_by_query(
        self,
        query: str,
        transform,
        mode: str = "or",
        corpus_df: "DataFrame | None" = None,
    ) -> int:
        """ES ``_update_by_query`` across shards: each shard matches and
        re-ingests its own slice (boolean matching is corpus-stats-free and
        shard doc sets are disjoint, so per-shard match sets union to the
        global one). ``corpus_df`` need not be pre-routed — each shard
        semi-joins it against its own match set."""
        self._require_routed("update_by_query")
        total = 0
        for eng in self.shards:
            total += eng.update_by_query(
                query, transform, mode=mode, corpus_df=corpus_df
            )
        return total

    def compact(self) -> None:
        """Fold every shard's streamed epochs + tombstones into its
        canonical layout — per-shard ``compact_streamed_index``, each with
        its own crash-safe versioned-dir commit (shards never coordinate:
        a crash mid-way leaves already-compacted shards serving the new
        layout and the rest the old, both readable)."""
        self._require_routed("compact")
        from ..streaming.ingest import compact_streamed_index

        for eng in self.shards:
            compact_streamed_index(self.spark, eng.index_dir)
            eng.refresh()

    def merge(self, max_segments: int = 8) -> None:
        """Per-shard tiered merge (Lucene TieredMergePolicy): bound each
        shard's epoch-segment count without full rewrites."""
        self._require_routed("merge")
        from ..streaming.ingest import merge_epochs_tiered

        for eng in self.shards:
            merge_epochs_tiered(self.spark, eng.index_dir, max_segments)
            eng.refresh()

    def stats(self) -> dict:
        """Aggregated index statistics: exact-int sums of the per-shard
        ``SearchEngine.stats()`` (driver-side metadata only — no Spark
        job), plus the per-shard breakdown under ``shards``."""
        per = [s.stats() for s in self.shards]
        n_docs = sum(p["n_docs"] for p in per)
        total_len = sum(p["total_len"] or round(p["n_docs"] * p["avgdl"]) for p in per)
        agg = {
            "n_shards": len(per),
            "n_docs": n_docs,
            "avgdl": total_len / n_docs if n_docs else 0.0,
            "total_len": total_len,
            "n_blocks": sum(p["n_blocks"] for p in per),
            # None = a shard past its churn limit reported inexact counts
            "n_deleted": sum(p["n_deleted"] or 0 for p in per),
            "n_updated": sum(p["n_updated"] or 0 for p in per),
            "tombstone_counts_exact": all(
                p.get("tombstone_counts_exact", True) for p in per
            ),
            "size_bytes": sum(p["size_bytes"] for p in per),
            "shards": per,
        }
        return agg

    # -- global statistics (the DFS phase) ---------------------------------
    def global_stats(self, terms: list[str]) -> tuple[int, float, dict]:
        """(N, avgdl, {term: df}) over ALL shards. N and Σdoc_len come from
        shard metas (exact ints — no float drift in the merge); df sums per
        term across shard dictionaries through each engine's term cache, so
        repeated terms cost zero Spark jobs. A term missing from every
        shard is absent from the map (the caller drops it, same as a
        dictionary miss on a single index)."""
        n = 0
        total_len = 0
        for s in self.shards:
            m = s.meta
            n += m.n_docs
            total_len += int(m.total_len or round(m.n_docs * m.avgdl))
        df: dict[str, int] = {}
        q = sorted(set(terms))  # pre-analyzed list: joining to a string
        # would re-run a non-idempotent analyzer (stem: class→clas) and
        # turn every sharded query surface into dictionary misses
        for s in self.shards:
            for r in s._resolve_terms(q):
                df[r["term"]] = df.get(r["term"], 0) + int(r["df"])
        return n, total_len / n if n else 0.0, df

    @staticmethod
    def _merge(lists: list[list[tuple[int, float]]], k: int):
        out = [t for lst in lists for t in lst]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]

    # -- query surface ------------------------------------------------------
    def search(self, query: str, k: int = 100, **kw) -> list[tuple[int, float]]:
        """Scatter-gather top-k: global stats → each shard scores under
        them (shard-local WAND pruning intact) → driver merges k·n_shards
        tuples. Composes with the single-engine kwargs that don't touch
        statistics (mode, use_wand, doc_filter, after, exclude)."""
        terms = self.shards[0]._analyze(query)
        if not terms:
            return []
        gs = self.global_stats(terms)
        if not gs[2]:
            return []
        lists = [s.search(query, k=k, global_stats=gs, **kw) for s in self.shards]
        return self._merge(lists, k)

    def fetch(self, doc_ids) -> DataFrame:
        """Point-fetch stored source rows across shards: ids route to their
        owning shard with the build's own hash expression, each shard's
        fetch prunes to its hit partitions, results union. Requires shards
        built with ``store_source=True``."""
        from functools import reduce

        if self.routed:
            routed = self._route_ids(doc_ids)
            parts = [
                self.shards[s].fetch(ids)
                for s, ids in enumerate(routed) if ids
            ]
        else:
            # alias members share no routing hash — ask every member; each
            # fetch still prunes to the requested ids' partitions, and an
            # id a member doesn't hold simply matches no row there
            ids = list(doc_ids)
            parts = [s.fetch(ids) for s in self.shards] if ids else []
        if not parts:
            return self.shards[0].fetch([])  # empty frame, store-checked
        return reduce(lambda a, b: a.unionByName(b), parts)

    def search_fetch(self, query: str, k: int = 10, **kw) -> list[dict]:
        """Scatter-gather top-k + routed source fetch (the full ES
        query-then-fetch across shards)."""
        hits = self.search(query, k=k, **kw)
        if not hits:
            return []
        id_col = self.shards[0].meta.source_id_col
        rows = {
            r[id_col]: r.asDict()
            for r in self.fetch([d for d, _ in hits]).collect()
        }
        out = []
        for rank, (doc_id, score) in enumerate(hits, 1):
            row = dict(rows.get(doc_id) or {id_col: doc_id})
            row.update(rank=rank, score=score)
            out.append(row)
        return out

    def suggest(self, prefix: str, n: int = 10) -> list[tuple[str, int]]:
        """Autocomplete under GLOBAL df: each shard contributes ALL of its
        prefix-matching dictionary rows, dfs sum across shards, top-n by
        (global df desc, term asc) — identical to a single-index suggest
        over the union corpus. Every match must come back: dfs SUM, so a
        term below any fixed per-shard cutoff everywhere can still be the
        global top-1 (no per-shard over-fetch factor is exact). Per shard
        the cost is one StartsWith-pushed scan of the broadcast-small
        dictionary — the prefix match set is dictionary-sized, not
        corpus-sized, so returning it whole is cheap."""
        per = {}
        for eng in self.shards:
            for term, df in eng.suggest(prefix, n=None):
                per[term] = per.get(term, 0) + df
        return sorted(per.items(), key=lambda t: (-t[1], t[0]))[:n]

    def _expanded_search(
        self, expanded: list[tuple[str, float]], k: int, **kw
    ) -> list[tuple[int, float]]:
        """Shared tail of the expansion modes: gather global stats for the
        expanded term set, re-rank nothing per shard (weights ride the
        rewriter), merge k·n_shards tuples."""
        if not expanded:
            return []
        gs = self.global_stats(sorted({t for t, _ in expanded}))
        if not gs[2]:
            return []
        query = " ".join(t for t, _ in expanded)
        lists = [
            s.search(query, k=k, global_stats=gs,
                     rewriter=lambda _q: expanded, **kw)
            for s in self.shards
        ]
        return self._merge(lists, k)

    def search_wildcard(
        self, pattern: str, k: int = 100, max_expansions: int = 50, **kw
    ) -> list[tuple[int, float]]:
        """Scatter-gather wildcard: the expansion set is the UNION of every
        shard's dictionary matches, capped at ``max_expansions`` by GLOBAL
        df (a term common overall must win the cap even if rare in the
        shard that contributed it), then one global-stats search."""
        # UNCAPPED per-shard expansion (None): a shard-local top-N could
        # drop a term whose GLOBAL df belongs in the top-N before the
        # global cap ever saw it — single-index identity demands the full
        # union (dictionary-sized, the broadcast-small side)
        cand = sorted({
            t for s in self.shards
            for t in s.expand_pattern(pattern, None)
        })
        if not cand:
            return []
        _, _, df = self.global_stats(cand)
        kept = sorted(df, key=lambda t: (-df[t], t))[:max_expansions]
        return self._expanded_search([(t, 1.0) for t in kept], k, **kw)

    def search_regexp(
        self, rx: str, k: int = 100, max_expansions: int = 50, **kw
    ) -> list[tuple[int, float]]:
        """Scatter-gather regexp: union of shard dictionary matches,
        global-df cap, global-stats search (same discipline as wildcard)."""
        cand = sorted({
            t for s in self.shards
            for t in s.expand_regexp(rx, None)  # uncapped: see wildcard
        })
        if not cand:
            return []
        _, _, df = self.global_stats(cand)
        kept = sorted(df, key=lambda t: (-df[t], t))[:max_expansions]
        return self._expanded_search([(t, 1.0) for t in kept], k, **kw)

    def search_fuzzy(
        self, term: str, k: int = 100, max_edits: int = 2,
        prefix_length: int = 0, max_expansions: int = 50, **kw
    ) -> list[tuple[int, float]]:
        """Scatter-gather fuzzy: union of shard expansions with their
        edit-distance boosts (boosts depend only on the term pair, so
        shards agree), global-df cap, global-stats search."""
        boosts: dict[str, float] = {}
        for s in self.shards:
            for t, w in s.expand_fuzzy(term, max_edits, prefix_length,
                                       None):  # uncapped: see wildcard
                boosts[t] = w
        if not boosts:
            return []
        _, _, df = self.global_stats(sorted(boosts))
        kept = sorted(df, key=lambda t: (-df[t], t))[:max_expansions]
        return self._expanded_search([(t, boosts[t]) for t in kept], k, **kw)

    def search_phrase(self, phrase: str, k: int = 100, **kw):
        """Scatter-gather exact-phrase top-k (needs shards built with
        ``with_positions=True``): same global-stats gather as ``search`` —
        phrase BM25 must rank under global idf/avgdl too. A shard missing
        any phrase term contributes nothing (no doc there can contain the
        phrase), while df still sums across the shards that have it."""
        terms = self.shards[0]._analyze(phrase)
        if not terms:
            return []
        gs = self.global_stats(terms)
        if set(terms) - set(gs[2]):
            return []  # a term absent from EVERY shard → no match anywhere
        lists = [
            s.search_phrase(phrase, k=k, global_stats=gs, **kw)
            for s in self.shards
        ]
        return self._merge(lists, k)

    def search_near(
        self, query: str, window: int, k: int = 100, ordered: bool = False, **kw
    ):
        """Scatter-gather proximity top-k — same contract as
        ``search_phrase`` with the NEAR window/order semantics."""
        terms = self.shards[0]._analyze(query)
        if not terms:
            return []
        gs = self.global_stats(terms)
        if set(terms) - set(gs[2]):
            return []
        lists = [
            s.search_near(query, window, k=k, ordered=ordered,
                          global_stats=gs, **kw)
            for s in self.shards
        ]
        return self._merge(lists, k)

    def search_common_terms(self, query: str, cutoff_frequency: float = 0.01,
                            k: int = 100, **kw):
        """Scatter-gather CommonTermsQuery. The low/common split MUST come
        from GLOBAL df (a term can look rare on one shard while common
        corpus-wide), so the gather phase computes it once; matching is
        then shard-local (doc sets are disjoint, so per-shard low-term
        match sets ARE the global one restricted to the shard) and every
        shard scores the full term set under the global stats."""
        terms = self.shards[0]._analyze(query)
        if not terms:
            return []
        gs = self.global_stats(terms)
        n, _, dfs = gs
        if not dfs:
            return []
        cutoff = float(cutoff_frequency)
        thr = cutoff * n if cutoff < 1.0 else cutoff
        all_terms = sorted(dfs)
        low = sorted(t for t in dfs if dfs[t] < thr)
        if not low or low == all_terms:
            lists = [s.search(query, k=k, global_stats=gs, **kw)
                     for s in self.shards]
            return self._merge(lists, k)
        lists = [
            s.search(query, k=k, global_stats=gs,
                     doc_filter=s.matching_docs(list(low), mode="or"), **kw)
            for s in self.shards
        ]
        return self._merge(lists, k)

    def search_span_first(self, phrase: str, limit: int, k: int = 100, **kw):
        """Scatter-gather SpanFirst top-k — same contract as
        ``search_phrase`` with the end-position cut (positions are
        shard-local token indices, identical to the single-index ones
        because docs are whole within a shard)."""
        terms = self.shards[0]._analyze(phrase)
        if not terms:
            return []
        gs = self.global_stats(terms)
        if set(terms) - set(gs[2]):
            return []
        lists = [
            s.search_span_first(phrase, limit, k=k, global_stats=gs, **kw)
            for s in self.shards
        ]
        return self._merge(lists, k)

    def search_query_string(
        self, qs: str, k: int = 100, metadata: DataFrame | None = None, **kw
    ):
        """Scatter-gather Lucene-style query strings: the gather phase
        collects global stats over the POSITIVE (scored) terms — boosts
        refold onto the global idf per shard, so `term^2` means the same
        thing on every shard; MUST / phrase / filter / NOT clauses resolve
        per shard (doc sets are shard-disjoint, so shard-local allow-sets
        ARE the global ones). `metadata` may be the full corpus table —
        each shard's allow-set join touches only its own doc_ids."""
        from ..querylang import parse_query_string

        p = parse_query_string(qs, self.shards[0].meta.analyzer)
        positive = p.positive_terms
        if not positive:
            raise ValueError(f"query string has no positive terms: {qs!r}")
        gs = self.global_stats(positive)
        if not gs[2]:
            return []
        lists = [
            s.search_query_string(qs, k=k, metadata=metadata,
                                  global_stats=gs, **kw)
            for s in self.shards
        ]
        return self._merge(lists, k)

    def search_bool(
        self, tree: dict, k: int = 100, metadata: "DataFrame | None" = None
    ) -> list[tuple[int, float]]:
        """Scatter-gather nested boolean trees: global stats gather over
        every term LEAF (filter/range leaves need no statistics), each
        shard evaluates the whole tree index-natively under them, driver
        merges top-ks. Correctness leans on shard-disjoint doc sets: a
        doc's must/should/must_not memberships all resolve inside its own
        shard, so per-shard tree results ARE the global ones, and global
        idf makes their scores comparable. ``metadata`` may be the full
        corpus table — but range/filter leaves can GENERATE docs (a
        pure-filter tree has no term leaf constraining the base), so the
        frame is restricted to each shard's OWN doc set before the
        scatter; otherwise every shard would report the same metadata row
        and the merge would return duplicates. Routed members restrict
        with the build's hash expression (a filter, no join); alias
        members (arbitrary disjoint indexes) semi-join their docstats
        sidecar."""
        from ..boolquery import tree_terms

        raw = tree_terms(tree)
        terms = sorted(
            {t for leaf in raw for t in self.shards[0]._analyze(leaf)}
        )
        gs = self.global_stats(terms) if terms else (0, 0.0, {})
        if terms and not gs[2]:
            return []
        lists = []
        for i, s in enumerate(self.shards):
            m = metadata
            if m is not None:
                if self.routed:
                    m = m.filter(
                        shard_of(F.col("doc_id"), len(self.shards)) == i
                    )
                else:
                    m = m.join(s.indexed_doc_ids(), "doc_id", "left_semi")
            lists.append(s.search_bool(tree, k=k, metadata=m, global_stats=gs))
        return self._merge(lists, k)

    def snippets(self, query: str, window: int = 8, **kw):
        """Scatter-gather highlighting: snippet extraction is per-doc
        (best window by query-term density — no corpus statistics), so
        the sharded result is exactly the union of per-shard frames.
        Requires positional shards. Returns one distributed DataFrame;
        on a cluster the per-shard scans stay independent jobs."""
        from functools import reduce

        parts = [s.snippets(query, window=window, **kw) for s in self.shards]
        return reduce(lambda a, b: a.unionByName(b), parts)

    def search_batch(
        self, queries: dict[str, str], k: int = 100, **kw
    ) -> dict[str, list[tuple[int, float]]]:
        """Batched scatter-gather: ONE dictionary pass per shard for the
        whole batch, one scoring job per shard, driver merge per query —
        the cluster throughput shape (per-shard jobs are independent; at
        scale they run concurrently on disjoint executors)."""
        terms = sorted(
            {t for q in queries.values() for t in self.shards[0]._analyze(q)}
        )
        gs = self.global_stats(terms) if terms else (0, 0.0, {})
        out: dict[str, list[tuple[int, float]]] = {qid: [] for qid in queries}
        if not gs[2]:
            return out
        per_shard = [
            s.search_batch(queries, k=k, global_stats=gs, **kw)
            for s in self.shards
        ]
        for qid in queries:
            out[qid] = self._merge([ps[qid] for ps in per_shard], k)
        return out
