"""Graph centrality for ranking: PageRank over a document/repo graph —
the canonical authority signal a web-scale search engine blends into
relevance (here usable as a static boost via ``scoring`` blends, or to
pick canonical docs among near-duplicate clusters).

Scale shape: one ranks⋈edges join + one hash agg per iteration, ranks
persisted each round and the previous round unpersisted (bounded
lineage — the same discipline as ``ops.dedup.dedup_components``).
Edge lists at 10^12 scale shuffle once per iteration on dst; skew
follows in-degree (salt hub nodes upstream if one doc dominates).

Determinism across engines: ranks are ROUNDED to ``round_dp`` decimals
after every iteration on BOTH sides (Spark and the DuckDB twin), so
float summation order cannot drift the trajectories apart. The twin
unrolls the K iterations as chained CTEs — standard SQL forbids
aggregation in a recursive term, and unrolling keeps it engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DP = 9
FINAL_DP = 6


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_dp: int = ROUND_DP,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """→ (node, rank) after ``n_iter`` power iterations of
    r(v) = (1-d)/N + d·Σ_{u→v} r(u)/outdeg(u), starting uniform.

    Every node must have at least one out-edge (no dangling mass): feed
    a SYMMETRIZED edge set (``symmetric_edges``) or handle dangling
    upstream. Raises if a dangling node is present — silently leaking
    rank mass would corrupt the scores. Nodes with no IN-edges are kept
    at the base rank (1-d)/N every round (they contribute but receive
    nothing); an empty edge set returns an empty frame.

    Ranks CHECKPOINT every ``checkpoint_interval`` rounds (lineage
    truncation — without any the logical plan chains n_iter joins and
    analysis blows the stack past ~20 rounds). Rounds between checkpoints
    stay LAZY, so Catalyst fuses them into one job: fewer materializations
    and driver round-trips both on a cluster and on tiny graphs, where
    per-round job launch dominated (measured ~14 s → ~6 s for the
    5-iteration bench graph going from interval 1 to 3). The interval
    bounds recompute-on-executor-loss to ``interval`` rounds; set it to 1
    for the old per-round behavior. Default ``localCheckpoint`` trades
    executor-loss durability for speed; pass ``checkpoint_dir`` for
    reliable checkpoints on long cluster runs (same discipline and caveats
    as ``ops.dedup.dedup_components``)."""
    # persist the deduped edges BEFORE anything counts them: the node
    # count, the dangling check, and the outdeg join all consume e — an
    # unpersisted e would re-run the whole upstream pipeline (typically
    # banding/pair generation) once per consumer (measured 3x on the
    # bench graph)
    e0 = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        e0.unpersist()
        return e0.select(F.col("src").alias("node"), F.lit(0.0).alias("rank"))
    n_dangling = nodes.join(
        e0.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).count()
    if n_dangling:
        nodes.unpersist()
        e0.unpersist()
        raise ValueError(
            f"{n_dangling} dangling node(s) — symmetrize the edges or add "
            "self-loops before pagerank"
        )
    from .dedup import _checkpointer

    ckpt = _checkpointer(edges.sparkSession, checkpoint_dir)
    deg = e0.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = ckpt(e0.join(deg, "src"))  # edges+outdeg materialized once
    e0.unpersist()
    base = round((1.0 - damping) / n, round_dp)
    ranks = ckpt(
        nodes.select("node", F.round(F.lit(1.0 / n), round_dp).alias("rank"))
    )
    if checkpoint_interval < 1:
        raise ValueError("checkpoint_interval must be >= 1")
    for i in range(n_iter):
        contrib = ranks.join(e, ranks["node"] == e["src"]).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("outdeg")).alias("c"),
        )
        agg = contrib.groupBy("node").agg(
            F.round(F.lit(base) + damping * F.sum("c"), round_dp).alias("rank")
        )
        # nodes with out-edges but NO in-edges receive no contributions —
        # they must keep the base rank, not vanish from the result (the
        # groupBy alone emits only dst nodes)
        ranks = nodes.join(agg, "node", "left").select(
            "node", F.coalesce(F.col("rank"), F.lit(base)).alias("rank")
        )
        if (i + 1) % checkpoint_interval == 0 and i + 1 < n_iter:
            ranks = ckpt(ranks)
    # materialize BEFORE dropping nodes: the final rounds stay lazy and
    # join against nodes, so unpersisting first would hand the caller a
    # frame whose first action re-runs the whole upstream edge pipeline
    out = ckpt(ranks.select("node", F.round("rank", FINAL_DP).alias("rank")))
    nodes.unpersist()
    return out


def symmetric_edges(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Undirected pair list → both edge directions (no dangling nodes by
    construction: every node in the graph has outdeg ≥ 1)."""
    ab = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    return ab.union(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    ).distinct()


def pagerank_sql(
    edges_sql: str,
    n_iter: int = 5,
    damping: float = 0.85,
    round_dp: int = ROUND_DP,
) -> str:
    """DuckDB twin: K unrolled iteration CTEs over an (src, dst) edge
    subquery, per-iteration rounding identical to the Spark side."""
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) t)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1)",
        f"pr0 AS (SELECT node, round(1.0 / n.n, {round_dp}) AS rank "
        f"FROM nodes, n)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"agg{i} AS (SELECT e.dst AS node, "
            f"round(round((1.0 - {damping}) / n.n, {round_dp}) "
            f"+ {damping} * sum(p.rank / deg.outdeg), {round_dp}) AS rank "
            f"FROM pr{i - 1} p JOIN e ON e.src = p.node "
            f"JOIN deg ON deg.src = p.node, n "
            f"GROUP BY e.dst, n.n)"
        )
        ctes.append(
            f"pr{i} AS (SELECT nodes.node, "
            f"coalesce(agg{i}.rank, round((1.0 - {damping}) / n.n, {round_dp})) AS rank "
            f"FROM nodes LEFT JOIN agg{i} ON agg{i}.node = nodes.node, n)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, round(rank, {FINAL_DP}) AS rank FROM pr{n_iter}"
    )
