"""SQ8 scalar quantization: int8 symmetric per-vector codec + quantized
cosine top-k + stored compressed layout.

Not in the reference (it has no embedding tables); first-class
training-data-pipeline surface per the driver brief — the 4× compression
read path for 100 TB embedding stores. Driver entries sq_quantize /
sq_topk / sq_stored_topk hash-check the codec and the scoring against
DuckDB twins at sf0.01."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import similarity

QUERY_VEC = [float((i * 37 % 19) - 9) / 9.0 for i in range(64)]


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_codec_roundtrip_error_bound(spark, embs):
    """Dequantized values are within scale/2 of the originals and the int
    range never exceeds ±127."""
    rows = (
        similarity.sq_quantize(embs)
        .join(embs.select("vec_id", "embedding"), "vec_id")
        .limit(50)
        .collect()
    )
    assert rows
    for r in rows:
        scale, q, orig = r["scale"], r["qvec"], r["embedding"]
        assert len(q) == len(orig)
        assert all(-127 <= v <= 127 for v in q)
        for qi, xi in zip(q, orig):
            assert abs(qi * scale - float(xi)) <= scale / 2 + 1e-12


def test_codec_matches_python(spark, embs):
    row = embs.limit(1).collect()[0]
    scale, q = similarity.sq_py_quantize([float(v) for v in row["embedding"]])
    got = (
        similarity.sq_quantize(embs)
        .filter(F.col("vec_id") == row["vec_id"])
        .collect()[0]
    )
    assert got["scale"] == pytest.approx(scale, rel=1e-12)
    assert list(got["qvec"]) == q


def test_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    quant = {r["vec_id"]: r for r in similarity.sq_quantize(df).collect()}
    assert quant[1]["scale"] == 0.0 and list(quant[1]["qvec"]) == [0, 0, 0]
    # zero-norm doc is excluded from top-k rather than NaN-ing the ranking
    out = similarity.sq_topk(df, [1.0, 1.0, 1.0], k=5).collect()
    assert [r["vec_id"] for r in out] == [2]


def test_sq_recall_vs_exact(spark, embs):
    """Quantized cosine is an approximation — measure recall@k against the
    exact float ranking and pin a floor. int8 with per-vector scales is a
    fine quantizer; recall@10 is expected near 1."""
    k = 10
    exact = [r["vec_id"] for r in similarity.cosine_topk(embs, QUERY_VEC, k=k).collect()]
    approx = [r["vec_id"] for r in similarity.sq_topk(embs, QUERY_VEC, k=k).collect()]
    recall = len(set(exact) & set(approx)) / k
    assert recall >= 0.8, f"recall@{k}={recall} ({exact} vs {approx})"


def test_stored_layout_identity_and_pruning(spark, embs, tmp_path):
    """The stored int8 layout returns EXACTLY the on-the-fly result, and its
    scan reads only (vec_id, qvec) — the scale column is pruned (cosine is
    scale-invariant)."""
    path = str(tmp_path / "sq")
    similarity.sq_write(embs, path)
    live = similarity.sq_topk(embs, QUERY_VEC, k=25).collect()
    stored_df = similarity.sq_stored_topk(spark, path, QUERY_VEC, k=25)
    stored = stored_df.collect()
    assert [(r["vec_id"], r["cos"]) for r in live] == [
        (r["vec_id"], r["cos"]) for r in stored
    ]
    plan = stored_df._sc._jvm.PythonSQLUtils.explainString(
        stored_df._jdf.queryExecution(), "formatted"
    )
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and all("scale" not in ln for ln in scan)
    # int8 on disk: the parquet schema stores qvec as tinyint
    raw = spark.read.parquet(path)
    assert dict(raw.dtypes)["qvec"] == "array<tinyint>"


def test_sq_rejects_zero_query(spark, embs):
    with pytest.raises(ValueError):
        similarity.sq_topk(embs, [0.0] * 64, k=5)
