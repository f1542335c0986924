"""SemDeDup (Abbas et al. 2023): IVF-clustered within-cluster cosine
dedup — brute-force twin identity (hash + trained centroids), the
centroid-farthest keep rule, and the cross-cluster blocking boundary."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _brute_semdedup(vecs: dict, tau: float, centroids: list):
    """Pure-Python twin of similarity.semantic_dedup: assign → within-
    cluster τ-edges → drop the centroid-CLOSER endpoint (ties drop the
    higher vec_id)."""

    def sqd(v, c):
        return sum((x - y) ** 2 for x, y in zip(v, c))

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 5)

    assign, cdist = {}, {}
    for i, v in vecs.items():
        ds = [sqd(v, c) for c in centroids]
        assign[i] = ds.index(min(ds))
        cdist[i] = round(min(ds), 5)
    dropped = set()
    for i, vi in vecs.items():
        for j, vj in vecs.items():
            if i == j or assign[i] != assign[j]:
                continue
            if cos(vi, vj) >= tau and (
                cdist[j] > cdist[i] or (cdist[j] == cdist[i] and j < i)
            ):
                dropped.add(i)
                break
    return assign, cdist, dropped


def test_semantic_dedup_matches_brute_force(spark):
    """Hash-quantizer path over a corpus slice: assignment, centroid
    distance, and keep verdicts identical to the pure-Python twin."""
    from searchengine_spark.ops.similarity import _centroid, semantic_dedup

    embs = spark.read.parquet(EMB).filter(F.col("vec_id") < 120)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in embs.collect()
    }
    cents = [_centroid(c, 64) for c in range(16)]
    assign, cdist, dropped = _brute_semdedup(vecs, 0.25, cents)
    got = {r["vec_id"]: r for r in semantic_dedup(embs, tau=0.25).collect()}
    assert set(got) == set(vecs)
    for i in vecs:
        assert got[i]["list_id"] == assign[i], i
        assert got[i]["cdist"] == pytest.approx(cdist[i], abs=2e-5)
        assert got[i]["keep"] == (i not in dropped), i
    assert dropped  # fixture is non-vacuous at this tau


def test_semantic_dedup_keeps_centroid_farthest(spark):
    """Within a duplicate pair the vector FARTHER from its centroid
    survives (the paper's diversity rule); near-identical vectors in
    DIFFERENT clusters are NOT deduped — clustering is the blocking,
    pinned behavior."""
    from searchengine_spark.ops.similarity import semantic_dedup

    c0 = [1.0] + [0.0] * 63
    c1 = [0.0, 1.0] + [0.0] * 62

    def near(c, eps):
        v = list(c)
        v[5] = eps
        return v

    rows = [
        (1, near(c0, 0.01)),  # cluster 0, close to centroid → dropped
        (2, near(c0, 0.30)),  # cluster 0, farther → survives
        (3, near(c1, 0.02)),  # cluster 1, close → dropped vs 4
        (4, near(c1, 0.25)),  # cluster 1, farther → survives
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, tau=0.9, centroids=[c0, c1], n_lists=2, dim=64
        ).collect()
    }
    assert out[1]["list_id"] == 0 and out[2]["list_id"] == 0
    assert out[3]["list_id"] == 1 and out[4]["list_id"] == 1
    assert not out[1]["keep"] and out[2]["keep"]
    assert not out[3]["keep"] and out[4]["keep"]
    # cross-cluster: 1↔3 are both near-axis vectors with cosine < tau
    # anyway, but 2↔4 share the v[5] bump — still untouched because they
    # live in different clusters (asserted above by both surviving)


def test_semantic_dedup_trained_centroids(spark):
    """ivf_train centroids drop in unchanged: keep verdicts match the
    brute twin under the SAME trained literals."""
    from searchengine_spark.ops.similarity import ivf_train, semantic_dedup

    embs = spark.read.parquet(EMB).filter(F.col("vec_id") < 100)
    cents = ivf_train(embs, n_lists=4, n_iter=3, sample=100)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in embs.collect()
    }
    _, _, dropped = _brute_semdedup(vecs, 0.25, cents)
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            embs, tau=0.25, centroids=cents, n_lists=4
        ).collect()
    }
    assert got == {i: (i not in dropped) for i in vecs}


def test_semantic_dedup_no_cross_join(spark):
    """The pair generator must be a within-cluster equi-join — never a
    BroadcastNestedLoopJoin / CartesianProduct (the n² shape SemDeDup's
    clustering exists to avoid)."""
    import contextlib
    import io

    from searchengine_spark.ops.similarity import semantic_dedup

    embs = spark.read.parquet(EMB)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        semantic_dedup(embs, tau=0.25).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
