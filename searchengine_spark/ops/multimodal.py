"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns with typed metadata, plus decode / feature-extract /
resize / frame-sample plumbing as Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the DECODE step is stubbed: with
``decoder="real"`` it raises ``NotImplementedError`` unless PIL/soundfile are
importable; with ``decoder="fake"`` (default in tests) it produces a
DETERMINISTIC fake decode derived from sha256(payload) so every downstream
stage — schema, partitioning, batch shapes, feature joins — is real and
testable. Swapping in a real codec touches only ``_decode_payload``.

Scale design: media bytes never leave the executor (mapInPandas streams Arrow
record batches); metadata extraction is pure JVM column arithmetic (magic-byte
sniffing via ``substring`` on binary); features are fixed-width
``array<float>`` ready for ops.similarity. Partition sizing: media rows are
fat — callers should ``spark.sql.files.maxPartitionBytes`` down or
``repartition`` so one Arrow batch of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

# magic prefixes → format label (hex, uppercase)
_MAGIC = [
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("664C6143", "flac"),
    ("00000018667479", "mp4"),
    ("00000020667479", "mp4"),
    ("1A45DFA3", "mkv"),
]


# ------------------------------------------------------------------ metadata
def media_metadata(df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, size_bytes, sha256, format): pure JVM column ops — no Python.
    Format is sniffed from magic bytes; unknown → 'bin'."""
    head = F.upper(F.hex(F.expr(f"substring({bin_col}, 1, 8)")))
    fmt = F.lit("bin")
    for magic, label in reversed(_MAGIC):
        fmt = F.when(head.startswith(magic), F.lit(label)).otherwise(fmt)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.col(bin_col)).cast("long").alias("size_bytes"),
        F.sha2(F.col(bin_col), 256).alias("sha256"),
        fmt.alias("format"),
    )


def text_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payload column from a text column (utf-8 bytes) —
    the sandbox stand-in for real media blobs in tests/benchmarks."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).cast("binary").alias("payload")
    )


# ------------------------------------------------------------------- decode
_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_pixel", DoubleType()),
        StructField("decoder", StringType()),
    ]
)


def _decode_payload(payload: bytes, decoder: str) -> tuple[int, int, int, float]:
    """Decode one media payload → (height, width, channels, mean_pixel).

    'real' needs an image codec (PIL) — not in this container, so it raises
    NotImplementedError (swap-in point for production). 'fake' derives a
    deterministic pseudo-decode from sha256(payload): stable across engines,
    executors, and runs."""
    if decoder == "real":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "real media decode requires an image codec (PIL) not present "
                "in this container; use decoder='fake' for the deterministic stub"
            ) from e
        raise NotImplementedError("real decoder wiring point")  # pragma: no cover
    h = hashlib.sha256(payload).digest()
    height = 1 + struct.unpack(">H", h[0:2])[0] % 2048
    width = 1 + struct.unpack(">H", h[2:4])[0] % 2048
    channels = 1 + h[4] % 4
    mean_pixel = round(struct.unpack(">I", h[5:9])[0] % 256_000 / 1000.0, 3)
    return height, width, channels, mean_pixel


def decode_media(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas decode: Arrow batches of (doc_id, payload) → per-item
    (height, width, channels, mean_pixel). Payload bytes stay executor-local."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(i), *_decode_payload(bytes(p), decoder), decoder)
                for i, p in zip(pdf[id_col], pdf[bin_col])
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "height", "width", "channels", "mean_pixel", "decoder"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=_DECODE_SCHEMA)


# -------------------------------------------------------------------- resize
_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("scale", FloatType()),
    ]
)


def resize_plan(
    df: DataFrame,
    max_side: int = 256,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """Resize operator: decode dims (stub) then compute the letterbox resize
    each item needs (aspect-preserving, longest side → max_side). In
    production the same mapInPandas would also emit resized bytes."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                h, w, _, _ = _decode_payload(bytes(p), decoder)
                scale = min(1.0, max_side / max(h, w))
                out.append((int(i), max(1, round(h * scale)), max(1, round(w * scale)), round(scale, 6)))
            yield pd.DataFrame(out, columns=["doc_id", "out_height", "out_width", "scale"])

    return df.select(id_col, bin_col).mapInPandas(run, schema=_RESIZE_SCHEMA)


# -------------------------------------------------------------- frame sample
_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("timestamp_ms", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """Video frame sampling (1→N rows per item): stub derives a deterministic
    duration from the payload hash and emits one row per sampled timestamp;
    a real build would demux + decode keyframes here."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                payload = bytes(p)
                if decoder == "real":
                    _decode_payload(payload, decoder)  # raises NotImplementedError
                hx = hashlib.sha256(payload).hexdigest()
                duration_ms = 1000 + int(hx[18:26], 16) % 60_000
                n = min(max_frames, max(1, duration_ms // every_ms))
                for fi in range(int(n)):
                    ts = fi * every_ms
                    fsha = hashlib.sha256(f"{hx}:{fi}".encode()).hexdigest()[:16]
                    out.append((int(i), fi, ts, fsha))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "timestamp_ms", "frame_sha"])

    return df.select(id_col, bin_col).mapInPandas(run, schema=_FRAME_SCHEMA)


# ------------------------------------------------------------------ features
_FEAT_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("feature", ArrayType(FloatType()))]
)


def extract_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id", dim: int = FEATURE_DIM
) -> DataFrame:
    """Fixed-width float feature vector per media item (deterministic stub:
    bytes of sha256(payload) → [-1, 1) floats). Output feeds
    ops.similarity.cosine_topk unchanged — the real model swap is local.

    Values are byte/128 − 1: dyadic with denominator 128, so float32 storage
    is EXACT and casts losslessly to double — which is what lets the DuckDB
    oracle (``extract_features_sql``) value-hash-match the whole mapInPandas
    path bit-for-bit."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, feats = [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                digest = hashlib.sha256(bytes(p)).digest()
                ids.append(int(i))
                feats.append([digest[j % 32] / 128.0 - 1.0 for j in range(dim)])
            yield pd.DataFrame({"doc_id": ids, "feature": feats})

    return df.select(id_col, bin_col).mapInPandas(run, schema=_FEAT_SCHEMA)


def extract_features_long(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id", dim: int = FEATURE_DIM
) -> DataFrame:
    """Driver-checkable projection of ``extract_features``: exploded
    (doc_id, dim, value) rows — scalar columns hash cleanly (array<float>
    columns crash pandas-side canonicalizers; CORRECTNESS_r01 media_features)."""
    feats = extract_features(df, bin_col, id_col, dim)
    return feats.select(
        "doc_id", F.posexplode("feature").alias("dim", "value")
    ).select(
        "doc_id",
        F.col("dim").cast("int").alias("dim"),
        F.col("value").cast("double").alias("value"),
    )


# ------------------------------------------------------------------- oracles
# DuckDB twins over text_as_media(documents) payloads: DuckDB sha256(VARCHAR)
# hashes the utf-8 bytes — identical to hashing the payload blob. The stub
# arithmetic (hash-hex slices → ints) is expressed 1:1 in SQL, so the driver
# value-hash-checks the ENTIRE mapInPandas plumbing end-to-end.


def media_metadata_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """Twin of media_metadata: utf-8 text payloads contain no magic prefixes
    → format='bin' (sniffing itself is pytest-covered on crafted headers)."""
    return f"""
SELECT {id_col} AS doc_id,
       octet_length(encode({text_col}))::BIGINT AS size_bytes,
       sha256({text_col}) AS sha256,
       'bin' AS format
FROM {table}
"""


def decode_media_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT {id_col} AS doc_id,
       (1 + ('0x' || substr(sha256({text_col}), 1, 4))::INT % 2048)::INT AS height,
       (1 + ('0x' || substr(sha256({text_col}), 5, 4))::INT % 2048)::INT AS width,
       (1 + ('0x' || substr(sha256({text_col}), 9, 2))::INT % 4)::INT AS channels,
       round((('0x' || substr(sha256({text_col}), 11, 8))::BIGINT % 256000) / 1000.0, 3) AS mean_pixel,
       'fake' AS decoder
FROM {table}
"""


def frame_sample_sql(
    table: str,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return f"""
WITH m AS (
  SELECT {id_col} AS doc_id, sha256({text_col}) AS hx FROM {table}),
d AS (
  SELECT doc_id, hx,
         least({max_frames}, greatest(1,
           (1000 + ('0x' || substr(hx, 19, 8))::BIGINT % 60000) // {every_ms})) AS n
  FROM m)
SELECT doc_id, fi::INT AS frame_idx, (fi * {every_ms})::BIGINT AS timestamp_ms,
       substr(sha256(hx || ':' || fi), 1, 16) AS frame_sha
FROM d, unnest(range(0, n)) AS r(fi)
"""


def extract_features_sql(
    table: str, dim: int = FEATURE_DIM, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """Twin of extract_features_long: byte j of sha256(payload) = hex chars
    2j+1..2j+2; value = byte/128 − 1 (exact double on both sides)."""
    return f"""
SELECT {id_col} AS doc_id, fi::INT AS dim,
       (('0x' || substr(h, (fi % 32) * 2 + 1, 2))::INT / 128.0 - 1.0) AS value
FROM (SELECT {id_col}, sha256({text_col}) AS h FROM {table}),
     unnest(range(0, {dim})) AS r(fi)
"""
