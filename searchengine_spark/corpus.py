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
