"""Sequence packing for pretraining: concatenate documents in a
deterministic order and cut the flat token stream into fixed-capacity
bins (``max_tokens``), emitting every (bin, doc) overlap with the doc's
token span inside that bin — the concat-and-chunk layout most LLM data
pipelines feed the trainer.

Reference parity note: the reference has no training-data surface; this
is part of the LLM-pipeline operator set (SURVEY.md extras).

Scale shape: a GLOBAL concatenation order would need a global sort (one
partition holds the cumsum tail — the classic window-without-partition
scale bug). Instead the corpus packs within ``n_groups`` deterministic
groups (``doc_id % n_groups`` — content-free, reproducible at any
parallelism): per-group cumulative sums run as a window PARTITIONED by
group (parallel across groups, each group's state independent), and bin
ids are namespaced (group_id, bin_no). With n_groups ≫ cores and hash-
uniform ids no group is a straggler; trainer shards consume groups
independently. Everything is JVM expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_docs(
    df: DataFrame,
    max_tokens: int,
    n_groups: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (group_id, bin_no, doc_id, tok_start, tok_end): document
    ``doc_id`` contributes its whitespace tokens [tok_start, tok_end) to
    bin (group_id, bin_no). Within a group, docs concatenate in doc_id
    order; bins are full except each group's last. A doc longer than
    ``max_tokens`` spans several bins (its chunks stay contiguous).
    Token counting is the shared whitespace count
    (``textstats._ws_tokens_expr``: trim-empty → 0, runs of whitespace =
    one separator) — ``split(text, ' ')`` returned ≥1 for EVERY string,
    so the empty-doc filter never fired and phantom tokens inflated bin
    spans. Swap a tokenizer-true count (``ops.textstats.token_count``)
    for production use."""
    from .textstats import _ws_tokens_expr
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    w = Window.partitionBy("group_id").orderBy("doc_id")
    sized = (
        df.select(
            F.col(id_col).alias("doc_id"),
            _ws_tokens_expr(text_col).alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn(
            # pmod: non-negative groups for the negative half of xxhash64
            # doc-id space (SQL twin mirrors with ((id % n) + n) % n)
            "group_id", F.pmod(F.col("doc_id"), F.lit(n_groups)).cast("long")
        )
        .withColumn("end", F.sum("n_tok").over(w))
        .withColumn("start", F.col("end") - F.col("n_tok"))
    )
    cap = F.lit(max_tokens)
    # integer `div`, not float `/`: past ~2^53 cumulative tokens a double
    # quotient can floor a doc starting exactly on a bin edge into the
    # previous bin (same rule as ops/temporal.range_join cells)
    first_bin = F.expr(f"start div {max_tokens}")
    last_bin = F.expr(f"(end - 1) div {max_tokens}")
    return (
        sized.select(
            "group_id",
            "doc_id",
            "start",
            "n_tok",
            F.explode(F.sequence(first_bin, last_bin)).alias("bin_no"),
        )
        .select(
            "group_id",
            "bin_no",
            "doc_id",
            F.greatest(F.lit(0), F.col("bin_no") * cap - F.col("start"))
            .cast("long")
            .alias("tok_start"),
            F.least(F.col("n_tok"), (F.col("bin_no") + 1) * cap - F.col("start"))
            .cast("long")
            .alias("tok_end"),
        )
    )


def pack_docs_sql(
    table: str,
    max_tokens: int,
    n_groups: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin (same grouping, ordering, and span arithmetic)."""
    return rf"""
WITH sized AS (
  SELECT {id_col} AS doc_id,
         CASE WHEN trim({text_col}) = '' THEN 0
              ELSE len(string_split_regex(trim({text_col}), '\s+'))
         END::BIGINT AS n_tok,
         ((({id_col} % {n_groups}) + {n_groups}) % {n_groups})::BIGINT AS group_id
  FROM {table} WHERE trim({text_col}) != ''),
spans AS (
  SELECT group_id, doc_id, n_tok,
         (sum(n_tok) OVER (PARTITION BY group_id ORDER BY doc_id))::BIGINT AS e,
         (sum(n_tok) OVER (PARTITION BY group_id ORDER BY doc_id) - n_tok)::BIGINT AS s
  FROM sized)
SELECT group_id, b.bin_no, doc_id,
       greatest(0, b.bin_no * {max_tokens} - s)::BIGINT AS tok_start,
       least(n_tok, (b.bin_no + 1) * {max_tokens} - s)::BIGINT AS tok_end
FROM spans,
     LATERAL (SELECT unnest(generate_series(s // {max_tokens},
                                            (e - 1) // {max_tokens}))
              AS bin_no) b
"""


def chunk_docs(
    df: DataFrame,
    size: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (the context-window splitter in
    front of every embedding/long-context pipeline): cut each doc's token
    sequence into windows of ``size`` tokens starting every ``stride``
    tokens (stride < size ⇒ overlapping windows; default stride = size ⇒
    disjoint). Chunk c covers tokens [c·stride, c·stride + size); windows
    are emitted while c·stride < n_tokens, so the tail chunk may be short
    but no token is ever dropped — and a doc shorter than ``size`` yields
    exactly one chunk.

    Tokens are the RAW lowercase token stream (no stopword removal — a
    trainer wants the text intact, unlike the index analyzer).

    Returns (doc_id, chunk_id, n_tokens, chunk_md5): the md5 of the
    space-joined window both keys exact-dedup of chunks and gives the
    DuckDB twin a hashable value without shipping the window text.

    Scale shape: tokenize → ``sequence``/``explode`` over chunk starts →
    ``slice`` — all JVM HigherOrderFunctions inside one projection; no
    shuffle at all (narrow transform), so this runs at scan speed on
    100 TB and the writer behind it controls output partitioning."""
    from ..tokenizer import TOKEN_PATTERN

    if size < 1:
        raise ValueError("size must be ≥ 1")
    stride = size if stride is None else stride
    if not 1 <= stride <= size:
        raise ValueError("stride must be in [1, size]")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / stride) + 1
    ).cast("int")
    out = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"), n.alias("_n"),
                  n_chunks.alias("_nc"))
        .filter(F.col("_nc") > 0)
        .select(
            "doc_id", "_toks", "_n",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
    )
    window = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, size)
    return out.select(
        "doc_id",
        "chunk_id",
        F.size(window).alias("n_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_md5"),
    )


def chunk_docs_sql(
    table: str,
    size: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``chunk_docs`` — same token regex, same window
    arithmetic, same md5-of-joined-window value."""
    from ..tokenizer import TOKEN_PATTERN

    stride = size if stride is None else stride
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS t
  FROM {table}),
starts AS (
  SELECT doc_id, t, unnest(range(((len(t) - 1) // {stride}) + 1)) AS chunk_id
  FROM toks WHERE len(t) > 0)
SELECT doc_id, chunk_id::INT AS chunk_id,
       len(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {size}])::INT AS n_tokens,
       md5(array_to_string(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {size}], ' ')) AS chunk_md5
FROM starts
"""
