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

    def __init__(self, spark: SparkSession, shard_dirs: list[str]):
        if not shard_dirs:
            raise ValueError("need at least one shard dir")
        self.spark = spark
        self.shards = [SearchEngine(spark, d) for d in shard_dirs]

    @classmethod
    def open(cls, spark: SparkSession, base_dir: str) -> "ShardedEngine":
        """Open a layout written by ``build``: base_dir/shard-<i>."""
        dirs = sorted(
            os.path.join(base_dir, d)
            for d in os.listdir(base_dir)
            if d.startswith("shard-")
        )
        return cls(spark, dirs)

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        base_dir: str,
        n_shards: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        **build_kw,
    ) -> "ShardedEngine":
        """Route the corpus by hash and build one independent index per
        shard. Shard builds run sequentially here (one Spark app — each
        build already uses every core); on a real cluster they are
        embarrassingly parallel across driver processes because nothing is
        shared but the input table."""
        dirs = []
        for s in range(n_shards):
            d = os.path.join(base_dir, f"shard-{s}")
            sub = corpus.filter(shard_of(F.col(id_col), n_shards) == s)
            SearchEngine(spark, d).build_index_from_df(
                sub, id_col=id_col, text_col=text_col, **build_kw
            )
            dirs.append(d)
        return cls(spark, dirs)

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
        q = " ".join(sorted(set(terms)))
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
        from ..tokenizer import tokenize_py

        terms = tokenize_py(query)
        if not terms:
            return []
        gs = self.global_stats(terms)
        if not gs[2]:
            return []
        lists = [s.search(query, k=k, global_stats=gs, **kw) for s in self.shards]
        return self._merge(lists, k)

    def search_batch(
        self, queries: dict[str, str], k: int = 100, **kw
    ) -> dict[str, list[tuple[int, float]]]:
        """Batched scatter-gather: ONE dictionary pass per shard for the
        whole batch, one scoring job per shard, driver merge per query —
        the cluster throughput shape (per-shard jobs are independent; at
        scale they run concurrently on disjoint executors)."""
        from ..tokenizer import tokenize_py

        terms = sorted({t for q in queries.values() for t in tokenize_py(q)})
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
