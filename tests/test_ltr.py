"""Learning-to-rank surface: feature extraction (oracle-checked via the
driver entry), the closed-form distributed ridge trainer vs numpy on the
collected table, exact weight recovery on a noiseless linear label, and
the scoring pass identity. The reference has no LTR — this replaces its
hand-tuned blend weights (Part C/searcher.py 0.9/0.1) with learned ones."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.entry_queries import BATCH_QUERIES, _scoring_ctx
from searchengine_spark.ltr import (
    FEATURES,
    ltr_features,
    ltr_score,
    ltr_train_linear,
    ltr_training_set,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feats(spark):
    tf, stats, dct, n, avgdl = _scoring_ctx(spark, SF_DIR)
    return ltr_features(spark, tf, stats, dct, BATCH_QUERIES, n, avgdl).cache()


def test_feature_shape_and_ranges(feats):
    rows = feats.collect()
    assert len(rows) > 0
    assert set(feats.columns) == {"query_id", "doc_id", *FEATURES}
    for r in rows:
        assert r["matched"] >= 1
        assert 0.0 < r["coverage"] <= 1.0
        assert r["tf_sum"] >= r["matched"]
        assert r["bm25"] > 0.0 and r["idf_sum"] > 0.0
        assert r["doc_len_norm"] > 0.0 and r["log_tf"] > 0.0


def test_trainer_matches_numpy_ridge(feats):
    """The distributed moment accumulation + driver solve must equal ridge
    on the collected table (same normal equations, same l2)."""
    labeled = feats.withColumn(
        "label", (F.col("doc_id") % 3).cast("double")
    )
    l2 = 1e-6
    w = ltr_train_linear(labeled, FEATURES, "label", l2=l2)

    pdf = labeled.select(*FEATURES, "label").toPandas()
    X = np.column_stack([pdf[c].to_numpy(float) for c in FEATURES])
    X1 = np.hstack([X, np.ones((len(X), 1))])
    y = pdf["label"].to_numpy(float)
    ref = np.linalg.solve(X1.T @ X1 + l2 * np.eye(X1.shape[1]), X1.T @ y)
    got = np.array([w[c] for c in FEATURES] + [w["_intercept"]])
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_trainer_recovers_noiseless_blend(feats):
    """label = 2·bm25 + 0.5·coverage + 0.125 exactly → the trainer must
    recover those weights (and ~0 on every other feature)."""
    labeled = feats.withColumn(
        "label",
        2.0 * F.col("bm25") + 0.5 * F.col("coverage") + F.lit(0.125),
    )
    w = ltr_train_linear(labeled, FEATURES, "label", l2=1e-10)
    assert abs(w["bm25"] - 2.0) < 1e-5
    assert abs(w["coverage"] - 0.5) < 1e-5
    assert abs(w["_intercept"] - 0.125) < 1e-4
    for c in ("tf_sum", "matched", "doc_len_norm", "log_tf", "idf_sum"):
        assert abs(w[c]) < 1e-5, (c, w[c])


def test_score_is_linear_combination(feats):
    w = {"bm25": 2.0, "coverage": 0.5, "_intercept": 0.125}
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in ltr_score(feats, w).collect()
    }
    for r in feats.collect():
        exp = 2.0 * r["bm25"] + 0.5 * r["coverage"] + 0.125
        assert abs(got[(r["query_id"], r["doc_id"])] - exp) < 1e-12


def test_topk_cut_and_rank(feats):
    out = ltr_score(feats, {"bm25": 1.0}, k=5, round_dp=5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, rows in per_q.items():
        ranks = sorted(r for r, _ in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= 5


def test_training_set_labels(feats, spark):
    some = feats.limit(3).collect()
    qrels = spark.createDataFrame(
        [(r["query_id"], r["doc_id"], 2.0) for r in some],
        "query_id string, doc_id long, label double",
    )
    full = ltr_training_set(feats, qrels)
    rows = {(r["query_id"], r["doc_id"]): r["label"] for r in full.collect()}
    assert full.count() == feats.count()  # left join keeps every candidate
    for r in some:
        assert rows[(r["query_id"], r["doc_id"])] == 2.0
    assert sum(1 for v in rows.values() if v == 0.0) == len(rows) - len(some)
