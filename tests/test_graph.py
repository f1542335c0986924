"""PageRank (ops/graph.py): hand-verified fixed point, mass conservation,
dangling guard, and the DuckDB unrolled-CTE twin identity.
"""

from __future__ import annotations

import pytest

from searchengine_spark.ops import graph


def test_symmetric_chain_known_values(spark):
    """Path graph 1-2-3: Spark trajectory == the same recurrence iterated
    in plain Python with identical per-iteration rounding (the bipartite
    graph oscillates at 0.85^k, so a fixed-point comparison at small k
    would need sloppy tolerances — trajectory identity is exact)."""
    K = 25
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, n_iter=K).collect()}
    r1 = r2 = round(1 / 3, 9)
    base = round(0.15 / 3, 9)
    for _ in range(K):
        r1, r2 = round(base + 0.85 * r2 / 2, 9), round(base + 0.85 * (2 * r1), 9)
    assert got == {1: round(r1, 6), 3: round(r1, 6), 2: round(r2, 6)}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)


def test_mass_conserved_each_iteration(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"  # directed cycle
    )
    for it in (1, 3):
        got = [r["rank"] for r in graph.pagerank(edges, n_iter=it).collect()]
        assert sum(got) == pytest.approx(1.0, abs=1e-5)


def test_dangling_node_raises(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="dangling"):
        graph.pagerank(edges, n_iter=2)


def test_duckdb_twin_identity(spark):
    import duckdb

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 5), (5, 6)]
    edges = graph.symmetric_edges(
        spark.createDataFrame(pairs, "doc_a long, doc_b long")
    )
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, n_iter=6).collect()}
    vals = " UNION ALL ".join(f"SELECT {a} a, {b} b" for a, b in pairs)
    esql = f"SELECT a AS src, b AS dst FROM ({vals}) UNION SELECT b, a FROM ({vals})"
    want = dict(duckdb.sql(graph.pagerank_sql(esql, n_iter=6)).fetchall())
    assert got == want


def test_authority_ordering(spark):
    """A hub connected to everything must outrank the leaves."""
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2)]
    edges = graph.symmetric_edges(
        spark.createDataFrame(pairs, "doc_a long, doc_b long")
    )
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, n_iter=10).collect()}
    assert got[0] == max(got.values())
    assert got[3] < got[1]  # leaf below the better-connected node


def test_checkpoint_interval_invariant(spark):
    """Ranks are rounded per iteration, so where the lineage is truncated
    cannot change the trajectory: interval 1 (old per-round behavior),
    the default, and interval > n_iter (never checkpoints) all agree."""
    pairs = [(0, i) for i in range(1, 6)] + [(2, 3), (4, 5)]
    edges = graph.symmetric_edges(
        spark.createDataFrame(pairs, "doc_a long, doc_b long")
    )
    runs = [
        {r["node"]: r["rank"] for r in
         graph.pagerank(edges, n_iter=5, checkpoint_interval=iv).collect()}
        for iv in (1, 3, 99)
    ]
    assert runs[0] == runs[1] == runs[2]
    with pytest.raises(ValueError, match="checkpoint_interval"):
        graph.pagerank(edges, n_iter=2, checkpoint_interval=0)


def test_authority_blend_reorders_close_scores(spark):
    from searchengine_spark.scoring import authority_blend

    scored = spark.createDataFrame(
        [(1, 1.00), (2, 0.99), (3, 5.0)], "doc_id long, score double"
    )
    ranks = spark.createDataFrame(
        [(2, 0.6), (1, 0.1)], "node long, rank double"  # doc 3 not in graph
    )
    got = dict(authority_blend(scored, ranks, 0.5, round_dp=6).collect())
    # doc 2's authority (max) lifts it past doc 1; doc 3 unchanged (no auth)
    assert got[2] > got[1] and got[3] == 5.0
    assert got[2] == round(0.99 * 1.5, 6) and got[1] == round(1.0 * (1 + 0.5 / 6), 6)


def test_source_only_node_keeps_base_rank(spark):
    """A node with out-edges but no in-edges must stay in the output at
    the base rank (1-d)/N, in BOTH engines, with mass conserved."""
    import duckdb

    edges = spark.createDataFrame(
        [(3, 1), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, n_iter=8).collect()}
    assert 3 in got and got[3] == 0.05  # (1-0.85)/3, rounded
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)
    esql = "SELECT 3 src, 1 dst UNION ALL SELECT 1, 2 UNION ALL SELECT 2, 1"
    want = dict(duckdb.sql(graph.pagerank_sql(esql, n_iter=8)).fetchall())
    assert got == want


def test_empty_edges_returns_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(edges, n_iter=3).collect() == []
