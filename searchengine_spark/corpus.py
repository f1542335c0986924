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


def with_doc_id(df: DataFrame) -> DataFrame:
    """Derive the engine's doc_id + content invariant (SURVEY.md §1.3).

    doc_id must be deterministic, order-independent, and 64-bit at 10^12
    scale → xxhash64(repo, path, commit); collision audit in tests.
    """
    return df.withColumn("doc_id", F.xxhash64("repo", "path", "commit")).withColumn(
        "content_sha", F.sha2("content", 256)
    )
