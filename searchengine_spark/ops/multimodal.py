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


def _decode_png(payload: bytes) -> tuple[int, int, int, float]:
    """REAL PNG decode, pure stdlib (zlib): IHDR dims → IDAT inflate →
    per-scanline unfilter (filters 0-4, the full spec set) → mean over raw
    samples. Supports the non-interlaced 8-bit color types (gray / RGB /
    gray+alpha / RGBA — what training-data pipelines actually store);
    anything else raises ValueError so the caller can surface a clean
    unsupported-format error rather than a wrong answer."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos, idat = 8, bytearray()
    width = height = bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    channels_by_type = {0: 1, 2: 3, 4: 2, 6: 4}
    if width is None or color_type not in channels_by_type:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if bit_depth != 8 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, interlace={interlace})"
        )
    channels = channels_by_type[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    prev = bytearray(stride)
    total = 0
    for y in range(height):
        off = y * (stride + 1)
        filt = raw[off]
        if filt > 4:
            raise ValueError(f"invalid PNG filter type {filt}")
        line = bytearray(raw[off + 1 : off + 1 + stride])
        for x in range(stride):
            a = line[x - channels] if x >= channels else 0  # left
            b = prev[x]  # up
            c = prev[x - channels] if x >= channels else 0  # up-left
            if filt == 1:
                line[x] = (line[x] + a) & 0xFF
            elif filt == 2:
                line[x] = (line[x] + b) & 0xFF
            elif filt == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif filt == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        total += sum(line)
        prev = line
    mean_pixel = round(total / (height * stride), 3) if height * stride else 0.0
    return height, width, channels, mean_pixel


def _decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """REAL WAV decode via the stdlib ``wave`` module: (1, n_frames,
    n_channels, mean |amplitude| normalized to [0, 255]) — the audio row
    mapped onto the image-shaped decode schema (height 1, width = sample
    count), so downstream resize/feature stages treat both uniformly."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        n_frames = w.getnframes()
        sampwidth = w.getsampwidth()
        frames = w.readframes(n_frames)
    if sampwidth == 2:
        import array

        samples = array.array("h")
        samples.frombytes(frames[: len(frames) - len(frames) % 2])
        mean = (
            sum(abs(s) for s in samples) / len(samples) / 32768.0 * 255.0
            if samples
            else 0.0
        )
    elif sampwidth == 1:  # unsigned 8-bit
        mean = (
            sum(abs(b - 128) for b in frames) / len(frames) / 128.0 * 255.0
            if frames
            else 0.0
        )
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    return 1, n_frames, channels, round(mean, 3)


def _decode_payload(payload: bytes, decoder: str) -> tuple[int, int, int, float]:
    """Decode one media payload → (height, width, channels, mean_pixel).

    'real' decodes PNG (pure-stdlib zlib inflate + full filter set) and WAV
    (stdlib ``wave``) end-to-end — golden-tested in test_multimodal.py —
    and raises NotImplementedError for codec-requiring formats (JPEG/MP4/…
    need PIL/ffmpeg, absent in this container; that error is the documented
    swap-in point for production codecs). 'fake' derives a deterministic
    pseudo-decode from sha256(payload): stable across engines, executors,
    and runs."""
    if decoder == "real":
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(payload)
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "real decode covers PNG and WAV (stdlib); this payload needs "
                "an external codec (PIL/ffmpeg) not present in this "
                "container — use decoder='fake' for the deterministic stub"
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
                    # frame sampling is a VIDEO op: even the formats
                    # _decode_payload now really decodes (PNG/WAV) have no
                    # frames to sample, and video demux needs a codec
                    # (ffmpeg) absent here — never fall through to the
                    # hash stub under the 'real' flag
                    raise NotImplementedError(
                        "real frame sampling requires a video demuxer "
                        "(ffmpeg) not present in this container; use "
                        "decoder='fake' for the deterministic stub"
                    )
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
