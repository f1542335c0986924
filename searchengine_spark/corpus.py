"""Deterministic synthetic source-code corpus matching BASELINE.json
input_hint: (repo:string, path:string, commit:string, lang:string,
content:string).

Mirrors FIXTURES.md §1: identifier pools + language keywords + a shared
license-header boilerplate that creates realistic Zipf skew and hot tokens
(``def``/``import``/license lines with df≈N — the skew the salted
repartitioning must defuse, SURVEY.md §7 'hot-term skew').

doc_id = xxhash64(repo, path, commit) (computed Spark-side with the built-in
``xxhash64`` so it is identical across parallelism levels); content_sha =
sha2(content, 256) is the per-row invariant (input_hint).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "js", "go", "c"]

_KEYWORDS = {
    "python": ["def", "class", "import", "return", "self", "none", "lambda", "yield"],
    "java": ["public", "static", "void", "class", "import", "return", "final", "new"],
    "js": ["function", "const", "let", "return", "import", "export", "async", "await"],
    "go": ["func", "package", "import", "return", "defer", "struct", "interface", "range"],
    "c": ["int", "void", "return", "struct", "static", "include", "sizeof", "char"],
}

_LICENSE = (
    "copyright 2020 the example authors licensed under the apache license "
    "version 2_0 you may not use this file except in compliance with the license"
)

_IDENT_STEMS = [
    "index", "build", "merge", "query", "score", "token", "parse", "rank",
    "buffer", "stream", "batch", "shard", "node", "graph", "cache", "heap",
    "block", "codec", "posting", "term", "doc", "reader", "writer", "config",
]


def _content(rng: random.Random, lang: str) -> str:
    kws = _KEYWORDS[lang]
    n_lines = rng.randint(20, 120)
    lines = [_LICENSE]
    # Zipf-ish identifier pool per file
    idents = [
        f"{rng.choice(_IDENT_STEMS)}_{rng.choice(_IDENT_STEMS)}{rng.randint(0, 99)}"
        for _ in range(rng.randint(5, 30))
    ]
    for _ in range(n_lines):
        words = []
        for _ in range(rng.randint(3, 10)):
            r = rng.random()
            if r < 0.35:
                words.append(rng.choice(kws))
            elif r < 0.5:
                words.append(rng.choice(_IDENT_STEMS))
            else:
                words.append(rng.choice(idents))
        lines.append(" ".join(words))
    return "\n".join(lines)


def generate_rows(n_files: int, seed: int = 42) -> list[tuple[str, str, str, str, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n_files):
        repo = f"org/name-{i // 50}"
        lang = LANGS[i % len(LANGS)]
        ext = {"python": "py", "java": "java", "js": "js", "go": "go", "c": "c"}[lang]
        path = f"src/pkg{i % 7}/mod_{i}.{ext}"
        commit = hashlib.sha1(f"{repo}:{i}:{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, _content(rng, lang)))
    return rows


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def corpus_df(spark: SparkSession, n_files: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    df = spark.createDataFrame(generate_rows(n_files, seed), CORPUS_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return with_doc_id(df)


def corpus_df_dist(
    spark: SparkSession, n_files: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed synthetic corpus: content generated executor-side from a
    per-file rng seed (``seed·1000003 + i``), so generation parallelizes and
    is order-independent — the scale path for 10^5+ file benchmarks (the
    driver-side ``corpus_df`` ships every row through the py4j bridge).
    Same schema and statistical shape as ``corpus_df``; not row-identical to
    it (different rng stream per design)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def gen_content(idx, lang):  # (pd.Series, pd.Series) -> pd.Series
        return pd.Series(
            [
                _content(random.Random(seed * 1_000_003 + int(i)), lg)
                for i, lg in zip(idx, lang)
            ]
        )

    base = spark.range(n_files).select(F.col("id").cast("long").alias("i"))
    if partitions:
        base = base.repartition(partitions)
    langs = F.array(*[F.lit(lg) for lg in LANGS])
    ext = F.create_map(
        *[x for lg, e in (("python", "py"), ("java", "java"), ("js", "js"), ("go", "go"), ("c", "c"))
          for x in (F.lit(lg), F.lit(e))]
    )
    df = (
        base.withColumn("repo", F.concat(F.lit("org/name-"), (F.col("i") / 50).cast("long")))
        .withColumn("lang", langs[(F.col("i") % len(LANGS)).cast("int")])
        .withColumn(
            "path",
            F.concat(
                F.lit("src/pkg"), (F.col("i") % 7).cast("string"),
                F.lit("/mod_"), F.col("i").cast("string"), F.lit("."), ext[F.col("lang")],
            ),
        )
        .withColumn("commit", F.sha1(F.concat_ws(":", "repo", "i", F.lit(str(seed)))))
        .withColumn("content", gen_content(F.col("i"), F.col("lang")))
        .select("repo", "path", "commit", "lang", "content")
    )
    return with_doc_id(df)


def with_doc_id(df: DataFrame) -> DataFrame:
    """Derive the engine's doc_id + content invariant (SURVEY.md §1.3).

    doc_id must be deterministic, order-independent, and 64-bit at 10^12
    scale → xxhash64(repo, path, commit); collision audit in tests.
    """
    return df.withColumn("doc_id", F.xxhash64("repo", "path", "commit")).withColumn(
        "content_sha", F.sha2("content", 256)
    )


def locality_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("repo", "path", "commit"),
    range_bits: int = 8,
    id_col: str = "doc_id",
    n_partitions: int | None = None,
    strided: bool = False,
) -> DataFrame:
    """Reassign ``id_col`` so postings delta-gap-compress: docs get dense
    ranks in ``order_cols`` order (URL-/path-ordered docIDs — the classic
    web-index compression trick: files of one repo are adjacent, share
    vocabulary, and their posting gaps become 1-2 varbyte bytes instead of
    the ~9 a random 64-bit hash gap costs).

    The rank is packed as ``(rank // cap) << (64 - range_bits) | rank %
    cap`` with ``cap = ceil(N / 2**range_bits)``: the high bits reproduce
    the build's ``doc_range`` salt exactly, so query-stage parallelism
    stays balanced (2**range_bits equal ranges) while WITHIN a range ids
    are consecutive. Build with the same (or smaller) ``range_bits``.

    ``strided=True`` packs ``(rank % 2**range_bits) << shift | rank //
    2**range_bits`` instead — ranges take every 2**range_bits-th doc, so
    the GLOBAL order is reproduced at the head of EVERY range rather than
    range 0 holding the first N/2**range_bits docs. Within a range local
    ids stay dense (consecutive in-range docs differ by exactly 1 — the
    gap distribution, hence compression, is identical to the contiguous
    packing). Contiguous is right for locality ordering (one repo's files
    land in one range → one posting block); strided is right for impact
    ordering (every per-range query kernel needs its share of high-impact
    docs at the head or its group-local θ never rises — see
    ``impact_ids``).

    Scale shape: a global rank with a partitionless window would funnel
    the corpus through one task. Instead: range-repartition on the order
    columns, sort within partitions, count per partition (small job on the
    persisted relation), broadcast the offset cumsum, then assign ranks
    per-partition with a vectorized Arrow kernel — two jobs, no global
    sort bottleneck, deterministic at any parallelism because
    ``order_cols`` is a total order (unique per row).
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas batches)

    from pyspark import StorageLevel

    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism
    cols = [c for c in df.columns if c != id_col]
    sorted_df = (
        df.select(*cols)
        .repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_pid"]: r["c"]
        for r in sorted_df.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n_total = sum(counts.values())
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    cap = max(1, -(-n_total // (1 << range_bits)))
    shift = np.uint64(64 - range_bits)
    offsets_bc = spark.sparkContext.broadcast(offsets)

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sorted_df.schema.fields
        if f.name != "_pid"
    ) + f", `{id_col}` bigint"

    def assign(batches):
        offset = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if offset is None:
                offset = offsets_bc.value[int(pdf["_pid"].iloc[0])]
            rank = np.arange(offset, offset + len(pdf), dtype=np.uint64)
            offset += len(pdf)
            if strided:
                n_ranges = np.uint64(1 << range_bits)
                packed = ((rank % n_ranges) << shift) | (rank // n_ranges)
            else:
                packed = ((rank // np.uint64(cap)) << shift) | (rank % np.uint64(cap))
            out = pdf.drop(columns=["_pid"])
            out[id_col] = packed.view(np.int64)
            yield out

    # The counts/offsets were collected against the cached partitioning —
    # the assignment pass MUST read those same materialized partitions (a
    # fresh repartitionByRange sampler could draw different boundaries and
    # mis-assign ranks). Materialize the assignment eagerly, then release
    # the cache: the old "caller frees it via lineage" story had no public
    # handle, so every call leaked one corpus-sized cached relation for
    # the session lifetime.
    out = sorted_df.mapInPandas(assign, schema=schema).localCheckpoint()
    sorted_df.unpersist()
    return out


def impact_ids(
    df: DataFrame,
    impact_col: str,
    tiebreak: tuple[str, ...] = ("repo", "path", "commit"),
    descending: bool = True,
    range_bits: int = 8,
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Impact-ordered docID reassignment (static index sorting — the
    docID-reordering family Lucene ships as ``IndexSorter`` and the
    block-max-WAND literature calls impact ordering): docs get dense ranks
    by a STATIC priority (``impact_col``, numeric, non-NaN; descending by
    default) so the highest-impact docs cluster into the first posting
    blocks of every term. Block-max metadata then becomes skewed instead
    of flat — after top-k fills from the head blocks, θ exceeds the tail
    blocks' bounds and the WAND sweep never decodes them (pytest-measured:
    the decode count drops vs the same corpus under hash ids; results stay
    rank-identical because BM25 only sees tf/dl/df, never the id).

    What to pass as impact: a quality/authority score (pagerank,
    ``authority_blend``'s input) with ``descending=True``; or for pure
    BM25, document LENGTH with ``descending=False`` — shorter docs carry
    the larger length-normalized upper bounds, so length-ascending is the
    BM25-impact proxy.

    Built on the same two-job range-repartition + broadcast-offset rank
    machinery as ``locality_ids`` (no global sort bottleneck); ``tiebreak``
    must make (impact, *tiebreak) a total order. The sort key is the exact
    NEGATED impact (int64/float64 sign flip — no lossy double cast), so
    Spark's ascending rank equals the twin's ``ORDER BY impact DESC`` even
    where a float cast would collide distinct values.

    Packing is STRIDED (``locality_ids(strided=True)``): range = rank %
    2**range_bits, local id = rank // 2**range_bits. The query kernel runs
    per doc_range group and merges group-local top-ks, so every group must
    see the impact order at ITS head — contiguous packing would give all
    the high-impact docs to range 0 and leave the other groups' θ too low
    to prune anything (measured: the contiguous variant decoded MORE
    blocks than hash ids on the pruning benchmark; strided decodes a
    fraction)."""
    # F.expr: ``impact_col`` may be a bare column name or any numeric SQL
    # expression (e.g. "length(content)")
    key = (-F.expr(impact_col)) if descending else F.expr(impact_col)
    tmp = df.withColumn("_impact_key", key)
    out = locality_ids(
        tmp,
        order_cols=("_impact_key", *tiebreak),
        range_bits=range_bits,
        id_col=id_col,
        n_partitions=n_partitions,
        strided=True,
    )
    return out.drop("_impact_key")


def impact_ids_sql(
    table: str,
    impact_sql: str,
    tiebreak: tuple[str, ...] = ("repo", "path", "commit"),
    descending: bool = True,
    range_bits: int = 8,
    id_col: str = "doc_id",
    out_cols: tuple[str, ...] | None = None,
) -> str:
    """DuckDB twin of ``impact_ids`` — strided packing (range = rank %
    2**range_bits) under the order clause ``impact DESC/ASC, tiebreak
    ASC``."""
    order = f"{impact_sql} {'DESC' if descending else 'ASC'}, " + ", ".join(tiebreak)
    cols = ", ".join(out_cols or tiebreak)
    n_ranges = 1 << range_bits
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (ORDER BY {order}) - 1 AS rank
  FROM {table}),
packed AS (
  SELECT *, (rank % {n_ranges})::HUGEINT * {1 << (64 - range_bits)}::HUGEINT
            + rank // {n_ranges} AS v
  FROM ranked)
SELECT {cols},
       (CASE WHEN v >= 9223372036854775808::HUGEINT
             THEN v - 18446744073709551616::HUGEINT ELSE v END)::BIGINT AS {id_col}
FROM packed
"""


def locality_ids_sql(
    table: str,
    order_cols: tuple[str, ...] = ("repo", "path", "commit"),
    range_bits: int = 8,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``locality_ids`` (HUGEINT packing wrapped to the
    signed 64-bit value Spark produces)."""
    order = ", ".join(order_cols)
    cols = ", ".join(order_cols)
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (ORDER BY {order}) - 1 AS rank,
         count(*) OVER () AS n
  FROM {table}),
packed AS (
  SELECT {cols},
         (rank // greatest(1, (n + {(1 << range_bits)} - 1) // {1 << range_bits}))::HUGEINT
           * {1 << (64 - range_bits)}::HUGEINT
         + rank % greatest(1, (n + {(1 << range_bits)} - 1) // {1 << range_bits}) AS v
  FROM ranked)
SELECT {cols},
       (CASE WHEN v >= 9223372036854775808::HUGEINT
             THEN v - 18446744073709551616::HUGEINT ELSE v END)::BIGINT AS {id_col}
FROM packed
"""
