"""Reciprocal-rank fusion (RRF) — hybrid retrieval's standard merge
(Cormack/Clarke/Buettcher SIGIR'09; Elasticsearch ``rrf`` retriever,
OpenSearch hybrid search): fuse N independently-produced rankings of the
same corpus into one, score(d) = Σ_r 1/(rank_constant + rank_r(d)) over
the rankings where d appears inside the window.

Reference parity note: the reference (GuyShimony/SearchEngine) blends
SCORES with fixed weights (``Part C/searcher.py`` 0.9/0.1 blends, grafted
as ``scoring.blended_score_partc``); score blends are scale-sensitive —
BM25 is unbounded, cosine lives in [0,1] — so a constant-weight blend is
dominated by whichever scorer has bigger numbers. RRF is the
scale-FREE alternative every modern engine ships: only ranks enter, so a
lexical BM25 list and a vector-space cosine list fuse without
calibration. We provide it as the principled hybrid the reference lacks.

Determinism contract (driver-oracle grade): callers pass rankings whose
scores are ALREADY rounded (the repo-wide ROUND_DP discipline), ranks are
row_number over (score desc, doc_id asc) — engine-independent — and the
RRF contribution 1/(rank_constant + rank) is an exact function of the
integer rank, so engine and SQL twins agree bit-for-bit before the final
(rounded) sum of ≤N doubles.

Scale shape: each ranking is window-truncated BEFORE the union (k·N rows
per query, never the full score lists), the union is a zero-shuffle
concat, and the fuse is one hash aggregation on (query_id, doc_id) with
map-side partials. A 1000-executor run fusing two retrievers at
window=1000 moves 2000 rows per query — driver- and shuffle-trivial.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RANK_CONSTANT = 60  # the literature/ES default


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 100,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    window: int = 100,
    per_query: bool = False,
) -> DataFrame:
    """Fuse rankings [(doc_id, score)] (or (query_id, doc_id, score) with
    ``per_query=True``) → top-k DataFrame[doc_id, score, rank] (plus
    query_id when batched). Each input is rank-truncated to ``window``
    first (ES ``rank_window_size``) — a document outside every window can
    never enter the fused top-k, so nothing beyond k·N rows per query
    survives the union. Ties: (score desc, doc_id asc) everywhere."""
    if not rankings:
        raise ValueError("need at least one ranking")
    keys = ["query_id", "doc_id"] if per_query else ["doc_id"]
    part = Window.partitionBy("query_id") if per_query else Window.partitionBy()
    w_in = part.orderBy(F.desc("score"), F.asc("doc_id"))

    def truncate_rank(r: DataFrame) -> DataFrame:
        if not per_query:
            # orderBy().limit() compiles to TakeOrderedAndProject — a
            # distributed partial top-window + driverless merge, so the
            # single-partition row_number below only ever sees ≤window rows
            # (never the full score list).
            r = r.orderBy(F.desc("score"), F.asc("doc_id")).limit(window)
        return (
            r.select(*keys, F.row_number().over(w_in).alias("r"))
            .filter(F.col("r") <= window)
        )

    contribs = [
        truncate_rank(r).select(
            *keys,
            F.lit(i).alias("src"),
            (1.0 / (F.lit(float(rank_constant)) + F.col("r"))).alias("c"),
        )
        for i, r in enumerate(rankings)
    ]
    # sorted-source fold, not a bare F.sum: with 3+ rankings the shuffle-
    # merge order of a doc's contributions is nondeterministic and float
    # addition is order-sensitive — last-ulp drift could flip near-ties
    # against the SQL twin (scoring._ordered_sum rule)
    fused = (
        reduce(DataFrame.unionByName, contribs)
        .groupBy(*keys)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("score")
        )
    )
    w_out = part.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_out).cast("long"))
        .filter(F.col("rank") <= k)
    )
