"""1-bit binary quantization (BBQ shape): packed sign bits vs midrange
thresholds, Hamming coarse pass via bit_count(xor), exact-cosine rerank.
Checks: the packed codec matches a pure-Python reference bit-for-bit,
rerank=|corpus| degenerates to exact cosine top-k, stored layout equals
on-the-fly, the coarse scan's ReadSchema excludes the raw vectors, and
non-multiple-of-64 dims pack into multiple words correctly."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import similarity as S


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def qvec():
    return [float((i * 37 % 19) - 9) / 9.0 for i in range(64)]


@pytest.fixture(scope="module")
def thr(embs):
    t = S.bq_thresholds(embs)
    assert len(t) == 64
    return t


def _py_cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_packed_bits_match_python(spark, embs, thr):
    got = {r["vec_id"]: list(r["bits"]) for r in S.bq_quantize(embs, thr).collect()}
    raw = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in embs.collect()}
    assert set(got) == set(raw)
    for vid, vec in raw.items():
        assert got[vid] == S.bq_py_bits(vec, thr), vid


def test_full_rerank_is_exact(spark, embs, qvec, thr):
    n = embs.count()
    exact = [r["vec_id"] for r in S.cosine_topk(embs, qvec, k=10).collect()]
    bq = [r["vec_id"] for r in S.bq_topk(embs, qvec, k=10, rerank=n, thresholds=thr).collect()]
    assert bq == exact


def test_coarse_recall_reasonable(spark, embs, qvec, thr):
    """With rerank=50 of 500 vectors the exact top-1 must survive the coarse
    cut on this data (sign bits carry the dominant directions here); weaker
    than a recall@10 bound on purpose — the codec is approximate."""
    exact_top = [r["vec_id"] for r in S.cosine_topk(embs, qvec, k=10).collect()]
    got = [r["vec_id"] for r in S.bq_topk(embs, qvec, k=10, rerank=50, thresholds=thr).collect()]
    assert exact_top[0] in got
    assert len(got) == 10


def test_stored_equals_on_the_fly(spark, embs, qvec, thr, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann") / "bq")
    S.bq_write(embs, p, thresholds=thr)
    live = [(r["vec_id"], r["hamming"], r["cos"])
            for r in S.bq_topk(embs, qvec, k=10, rerank=50, thresholds=thr).collect()]
    stored = [(r["vec_id"], r["hamming"], r["cos"])
              for r in S.bq_stored_topk(spark, p, qvec, k=10, rerank=50).collect()]
    assert stored == live
    meta = S.read_ann_meta(p)
    assert meta["kind"] == "bq" and meta["thresholds"] == thr


def test_coarse_scan_prunes_embedding(spark, embs, qvec, thr, tmp_path_factory):
    """The Hamming pass over the stored layout must read ONLY (vec_id, bits)
    — the 32x byte win. The rerank scan reads embedding, so the plan holds
    one scan without it and one with it."""
    import contextlib
    import io

    p = str(tmp_path_factory.mktemp("ann") / "bqp")
    S.bq_write(embs, p, thresholds=thr)
    df = S.bq_stored_topk(spark, p, qvec, k=10, rerank=50)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    coarse = [ln for ln in schemas if "bits" in ln]
    assert coarse, plan
    assert any("embedding" not in ln for ln in coarse), plan


def test_multi_word_packing(spark):
    """dim=70 → 2 words; full-rerank equality still holds and the second
    word holds bits 64..69."""
    import random

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(70)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    thr = S.bq_thresholds(df)
    assert len(thr) == 70
    bits = {r["vec_id"]: list(r["bits"]) for r in S.bq_quantize(df, thr).collect()}
    for vid, vec in rows:
        want = S.bq_py_bits(vec, thr)
        assert len(want) == 2 and bits[vid] == want
    q = rows[0][1]
    exact = [r["vec_id"] for r in S.cosine_topk(df, q, k=5).collect()]
    got = [r["vec_id"] for r in S.bq_topk(df, q, k=5, rerank=40, thresholds=thr).collect()]
    assert got == exact
