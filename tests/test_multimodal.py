"""Multimodal plumbing: binary columns, magic sniffing, mapInPandas decode /
resize / frame-sample / feature stubs (deterministic fakes; real decode is an
explicit NotImplementedError swap-in point)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, bytes.fromhex("FFD8FF") + b"jpegbody"),
        (2, bytes.fromhex("89504E47") + b"pngbody"),
        (3, b"RIFF" + b"wavbody"),
        (4, b"plain text payload"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_magic_sniffing_and_metadata(media_df):
    out = {r["doc_id"]: r for r in mm.media_metadata(media_df).collect()}
    assert out[1]["format"] == "jpeg"
    assert out[2]["format"] == "png"
    assert out[3]["format"] == "riff"
    assert out[4]["format"] == "bin"
    assert out[4]["size_bytes"] == len(b"plain text payload")
    assert out[4]["sha256"] == hashlib.sha256(b"plain text payload").hexdigest()


def test_decode_fake_deterministic(media_df):
    a = sorted(mm.decode_media(media_df).collect())
    b = sorted(mm.decode_media(media_df).collect())
    assert a == b
    for r in a:
        assert 1 <= r["height"] <= 2048 and 1 <= r["width"] <= 2048
        assert 1 <= r["channels"] <= 4
        assert 0.0 <= r["mean_pixel"] < 256.0
        assert r["decoder"] == "fake"


def test_decode_real_raises(media_df):
    with pytest.raises(Exception) as ei:
        mm.decode_media(media_df, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_plan_bounds(media_df):
    for r in mm.resize_plan(media_df, max_side=256).collect():
        assert max(r["out_height"], r["out_width"]) <= 256
        assert 0 < r["scale"] <= 1.0


def test_frame_sample_rows(media_df):
    rows = mm.frame_sample(media_df, every_ms=1000, max_frames=8).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, frames in by_doc.items():
        assert 1 <= len(frames) <= 8
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))
        assert all(f["timestamp_ms"] == f["frame_idx"] * 1000 for f in frames)
        assert len({f["frame_sha"] for f in frames}) == len(frames)


def test_features_fixed_width_and_similarity_ready(media_df, spark):
    feats = mm.extract_features(media_df)
    assert dict(feats.dtypes)["feature"] == "array<float>"
    rows = feats.collect()
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in rows)
    assert all(all(-1.0 <= v < 1.0 for v in r["feature"]) for r in rows)
    # composes with the similarity operator unchanged
    from searchengine_spark.ops import similarity

    q = [0.1] * mm.FEATURE_DIM
    top = similarity.cosine_topk(
        feats.withColumnRenamed("feature", "embedding").withColumnRenamed(
            "doc_id", "vec_id"
        ),
        q,
        k=2,
    )
    assert top.count() == 2


def test_text_payload_matches_duckdb_oracle(spark, sf_dir):
    """Full driver-style check of the three oracle-backed multimodal ops."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = mm.text_as_media(docs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for spark_df, sql in [
        (mm.media_metadata(media), mm.media_metadata_sql("documents")),
        (mm.decode_media(media), mm.decode_media_sql("documents")),
        (mm.frame_sample(media), mm.frame_sample_sql("documents")),
    ]:
        got = sorted(tuple(r) for r in spark_df.toPandas().itertuples(index=False, name=None))
        exp = sorted(tuple(r) for r in con.execute(sql).df().itertuples(index=False, name=None))
        assert got == exp


def test_ivf_trained_clusters(spark):
    """Trained IVF on clustered data: cluster members land in the same list,
    probing the query's cluster recovers the brute-force top-k."""
    import random

    from searchengine_spark.ops import similarity

    rng = random.Random(5)
    centers = [[5.0 if d % 3 == c else -2.0 for d in range(16)] for c in range(3)]
    rows = []
    for i in range(120):
        c = i % 3
        rows.append(
            (i, [centers[c][d] + rng.uniform(-0.3, 0.3) for d in range(16)])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.ivf_train(df, n_lists=3, n_iter=5, sample=120)
    assert len(cents) == 3 and all(len(c) == 16 for c in cents)
    assigned = {r["vec_id"]: r["list_id"] for r in
                similarity.ivf_assign(df, n_lists=3, dim=16, centroids=cents).collect()}
    # every true cluster maps to exactly one list
    for c in range(3):
        lists = {assigned[i] for i in range(120) if i % 3 == c}
        assert len(lists) == 1, (c, lists)

    q = [centers[1][d] + 0.1 for d in range(16)]
    exact = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              similarity.ivf_topk(df, q, k=10, n_lists=3, nprobe=1, centroids=cents).collect()]
    assert approx == exact  # query's cluster contains the entire true top-10
    # determinism of training
    assert cents == similarity.ivf_train(df, n_lists=3, n_iter=5, sample=120)
