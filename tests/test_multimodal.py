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


def _png_bytes(pixels, channels=3, filters=None):
    """Independent test-side PNG ENCODER (forward filters 0-4 per row) —
    the decoder under test must invert it exactly. ``pixels``: list of
    rows, each row a flat list of byte samples (len = width*channels)."""
    import struct as st
    import zlib

    height, stride = len(pixels), len(pixels[0])
    width = stride // channels
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    filters = filters or [0] * height
    raw = bytearray()
    prev = [0] * stride
    for y, row in enumerate(pixels):
        f = filters[y]
        raw.append(f)
        for x in range(stride):
            a = row[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if f == 0:
                enc = row[x]
            elif f == 1:
                enc = (row[x] - a) & 0xFF
            elif f == 2:
                enc = (row[x] - b) & 0xFF
            elif f == 3:
                enc = (row[x] - (a + b) // 2) & 0xFF
            else:  # 4 Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (row[x] - pred) & 0xFF
            raw.append(enc)
        prev = row

    def chunk(ctype, data):
        body = ctype + data
        return st.pack(">I", len(data)) + body + st.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = st.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(samples, channels=1, framerate=8000):
    import io
    import struct as st
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(b"".join(st.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_real_png_decode_golden():
    """Golden PNG: 2x2 RGB, filter 0, hand-computable mean."""
    pixels = [[10, 20, 30, 40, 50, 60], [70, 80, 90, 100, 110, 120]]
    h, w, c, mean = mm._decode_payload(_png_bytes(pixels), "real")
    assert (h, w, c) == (2, 2, 3)
    assert mean == round(sum(sum(r) for r in pixels) / 12, 3) == 65.0


def test_real_png_decode_all_filters_roundtrip():
    """Every PNG filter type (0-4) on a 5-row RGBA image: the test-side
    forward encoder and the decoder's inverse must round-trip the mean."""
    import random

    rng = random.Random(11)
    pixels = [[rng.randrange(256) for _ in range(4 * 4)] for _ in range(5)]
    payload = _png_bytes(pixels, channels=4, filters=[0, 1, 2, 3, 4])
    h, w, c, mean = mm._decode_payload(payload, "real")
    assert (h, w, c) == (5, 4, 4)
    expect = round(sum(sum(r) for r in pixels) / (5 * 16), 3)
    assert mean == expect


def test_real_png_rejects_unsupported():
    payload = bytearray(_png_bytes([[1, 2, 3]], channels=3))
    # corrupt bit depth 8 -> 16 inside IHDR (offset: 8 sig + 8 hdr + 8 dims)
    payload[24] = 16
    with pytest.raises(ValueError, match="bit_depth=16"):
        mm._decode_payload(bytes(payload), "real")


def test_real_wav_decode_golden():
    samples = [0, 16384, -16384, 32767, -32768, 0]
    h, w, c, mean = mm._decode_payload(_wav_bytes(samples), "real")
    assert (h, c) == (1, 1)
    assert w == len(samples)
    expect = round(
        sum(abs(s) for s in samples) / len(samples) / 32768.0 * 255.0, 3
    )
    assert mean == expect


def test_real_decode_through_spark(spark):
    """decode_media(decoder='real') end-to-end: PNG + WAV payloads in one
    frame, real dims out; metadata sniffs png/riff magic on the same rows."""
    png = _png_bytes([[255, 0, 0, 0, 255, 0], [0, 0, 255, 255, 255, 255]])
    wav = _wav_bytes([1000, -1000] * 50, channels=1)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))], "doc_id long, payload binary"
    )
    meta = {r["doc_id"]: r["format"] for r in mm.media_metadata(df).collect()}
    assert meta == {1: "png", 2: "riff"}
    rows = {r["doc_id"]: r for r in mm.decode_media(df, decoder="real").collect()}
    assert (rows[1]["height"], rows[1]["width"], rows[1]["channels"]) == (2, 2, 3)
    assert rows[2]["height"] == 1 and rows[2]["width"] == 100
    assert rows[1]["decoder"] == rows[2]["decoder"] == "real"


def test_real_png_rejects_invalid_filter_byte():
    payload = bytearray(_png_bytes([[1, 2, 3], [4, 5, 6]], channels=3))
    # corrupt the first scanline's filter byte inside the IDAT stream
    import struct as st
    import zlib

    # rebuild with a raw stream whose first filter byte is 9
    raw = bytearray(b"\x09\x01\x02\x03\x00\x04\x05\x06")
    def chunk(ctype, data):
        body = ctype + data
        return st.pack(">I", len(data)) + body + st.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", 1, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type 9"):
        mm._decode_payload(bad, "real")


def test_real_png_rejects_corrupt_idat():
    import struct as st
    import zlib

    def chunk(ctype, data):
        body = ctype + data
        return st.pack(">I", len(data)) + body + st.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"\x00notzlib")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        mm._decode_payload(bad, "real")
    trunc = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))  # far too short
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated PNG"):
        mm._decode_payload(trunc, "real")


def test_frame_sample_real_never_falls_through_to_stub(spark):
    """decoder='real' on frame_sample must raise even for formats the
    decoder CAN really decode (PNG/WAV have no frames to sample) — the
    hash stub must never masquerade as real-decoder output."""
    png = _png_bytes([[1, 2, 3]])
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    with pytest.raises(Exception) as ei:
        mm.frame_sample(df, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_real_png_roundtrip_property():
    """Property test: random dims/channels/filter assignments round-trip
    through the decoder with the exact pixel mean (the test-side encoder is
    an independent forward implementation of the PNG filter spec)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        height=st.integers(1, 6),
        width=st.integers(1, 6),
        channels=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31),
        data=st.data(),
    )
    def run(height, width, channels, seed, data):
        import random

        rng = random.Random(seed)
        pixels = [
            [rng.randrange(256) for _ in range(width * channels)]
            for _ in range(height)
        ]
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=height, max_size=height)
        )
        payload = _png_bytes(pixels, channels=channels, filters=filters)
        h, w, c, mean = mm._decode_payload(payload, "real")
        assert (h, w, c) == (height, width, channels)
        total = sum(sum(r) for r in pixels)
        assert mean == round(total / (height * width * channels), 3)

    run()
