"""Distributed BPE tokenizer-vocabulary training (Sennrich et al. 2016) —
the "train the tokenizer" step of an LLM data pipeline, re-expressed for
Spark.

The scale insight: BPE statistics depend only on the DISTINCT-WORD table
weighted by occurrence count, not on the corpus. So the corpus is touched
exactly ONCE (a (word, count) hash aggregation with map-side combine —
the same shape as the index build's tf stage), and the merge loop then
iterates over the |word-vocab|-sized table: per round, one pair-count
aggregation + a 1-row driver collect (the argmax pair) + one map-side
string replace. A 10^12-token corpus with 10^8 distinct words trains K
merges in K small jobs after one corpus pass.

Symbol representation: a word's current segmentation is a string with
symbols separated by DOUBLE spaces, padded with one space on each end
(``' l  o  w  </w> '``). A merge of (a, b) is then the plain (non-regex)
replacement ``' a  b ' -> ' ab '`` — left-to-right, non-overlapping,
which is exactly BPE's greedy merge semantics (``a a a`` with pair (a,a)
becomes ``aa a``), and is portable: Spark ``replace`` and DuckDB
``replace`` agree byte-for-byte, which is what makes the unrolled-CTE
driver oracle possible (RE2 has no lookahead, so a regex formulation
would not port). Symbols never contain spaces (tokens are ``[a-z0-9]+``
plus the ``</w>`` end-of-word marker), so the pattern can never match
across symbol boundaries.

Tie-break: per round the merged pair is max by (pair_count DESC, left
ASC, right ASC) — pinned so Spark, DuckDB, and the pure-Python oracle in
the tests pick identical merge sequences.

Reference anchor: the reference engine's tokenizer is fixed
(Part A/parser_module.py); BPE training is the corpus-adaptive
generalization a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import duckdb_tokens_cte, tokenize_raw_expr

EOW = "</w>"


def word_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt): the one corpus pass — distinct stopword-filtered
    tokens with occurrence counts (map-side-combined hash agg)."""
    return (
        df.select(F.explode(tokenize_raw_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _sym_init(word_col):
    """' c1  c2  ...  cN  </w> ' — double-space-joined char symbols."""
    return F.concat(
        F.lit(" "),
        F.array_join(F.split(word_col, ""), "  "),
        F.lit("  " + EOW + " "),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """(term_a, term_b, pair_count): adjacent-symbol pairs over the
    current segmentation, weighted by word count. Map-side zip_with —
    the only shuffle is the count aggregation."""
    arr = state.select(
        "cnt", F.split(F.trim(F.col("sym")), "  ").alias("arr")
    ).filter(F.size("arr") >= 2)
    pairs = arr.select(
        "cnt",
        F.explode(
            F.expr(
                "zip_with(slice(arr, 1, size(arr) - 1),"
                "         slice(arr, 2, size(arr) - 1),"
                "         (a, b) -> struct(a AS term_a, b AS term_b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.term_a", "p.term_b").agg(
        F.sum("cnt").alias("pair_count")
    )


def bpe_train(
    df: DataFrame,
    k_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_interval: int = 8,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn up to ``k_merges`` BPE merges. Returns (merges, final_state):
    merges = [(rank, left, right, pair_count)...] in learned order,
    final_state = (word, cnt, sym) with the end-of-training segmentation.

    Stops early when no pair reaches ``min_pair_count`` (merging hapax
    pairs only memorizes words). State is persisted per round with
    lineage truncated every ``checkpoint_interval`` rounds —
    ``localCheckpoint`` by default, reliable ``checkpoint_dir`` for long
    cluster runs (same discipline as ``dedup_components`` / pagerank).
    """
    from .dedup import _checkpointer

    spark = df.sparkSession
    ckpt = _checkpointer(spark, checkpoint_dir)
    state = word_counts(df, id_col, text_col).select(
        "word", "cnt", _sym_init(F.col("word")).alias("sym")
    )
    state = state.persist()
    merges: list[tuple[int, str, str, int]] = []
    prev = None
    for rank in range(int(k_merges)):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("pair_count"), F.asc("term_a"), F.asc("term_b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < int(min_pair_count):
            break
        a, b, c = top[0]["term_a"], top[0]["term_b"], int(top[0]["pair_count"])
        merges.append((rank, a, b, c))
        nxt = state.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
            ),
        )
        if (rank + 1) % int(checkpoint_interval) == 0:
            nxt = ckpt(nxt)
        nxt = nxt.persist()
        nxt.count()  # materialize before dropping the parent
        if prev is not None:
            prev.unpersist()
        prev, state = state, nxt
    # the loop unpersists prev only at the TOP of the next iteration, so
    # after the final merge (or an early break) the returned state's
    # parent would stay cached forever — release it here; state itself is
    # materialized, so dropping its parent costs nothing
    if prev is not None:
        prev.unpersist()
    return merges, state


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    schema = "rank long, lhs string, rhs string, pair_count long"
    return spark.createDataFrame(
        [(int(r), a, b, int(c)) for r, a, b, c in merges], schema
    )


def merges_from_df(df: DataFrame) -> list[tuple[int, str, str, int]]:
    """Load a stored merge table (the `merges/` parquet a `bpe-train` run
    wrote) back into the rank-ordered list the encoder replays. The merge
    list is vocabulary-sized metadata (10^3-10^5 rows), so the collect is
    bounded by design."""
    return [
        (int(r["rank"]), r["lhs"], r["rhs"], int(r["pair_count"]))
        for r in df.orderBy("rank").collect()
    ]


def bpe_vocab(state: DataFrame) -> DataFrame:
    """(piece, cnt): the learned subword vocabulary — final symbols
    weighted by word occurrence counts."""
    return (
        state.select(
            "cnt", F.explode(F.split(F.trim(F.col("sym")), "  ")).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """(word, pieces): segment each distinct word by replaying the merge
    list in learned rank order — the standard BPE encoder. Implemented as
    chained ``replace`` expressions in batches (Catalyst handles a few
    hundred; deeper merge lists re-materialize between batches so the
    expression tree stays shallow; each batch releases its predecessor's
    cache once materialized, so at most ONE |vocab|-sized frame — the one
    backing the returned result — stays cached however long the merge
    list). Runs over DISTINCT words only — at encode time the corpus
    joins this |vocab|-sized table."""
    out = words.select("word", _sym_init(F.col("word")).alias("sym"))
    BATCH = 64
    prev = None
    for i in range(0, len(merges), BATCH):
        col = F.col("sym")
        for _, a, b, _c in merges[i : i + BATCH]:
            col = F.replace(col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        out = out.select("word", col.alias("sym"))
        if i + BATCH < len(merges):
            out = out.persist()
            out.count()  # materialize before dropping the parent cache
            if prev is not None:
                prev.unpersist()
            prev = out
    return out.select(
        "word", F.split(F.trim(F.col("sym")), "  ").alias("pieces")
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, piece): the corpus token stream segmented into BPE
    pieces, position-preserving. The merge replay runs over distinct
    words; the corpus side is one posexplode + one (broadcastable when
    the word vocab fits) join — token text never shuffles twice."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_raw_expr(F.col(text_col))).alias("tok_pos", "word"),
    )
    encoded = bpe_encode_words(toks.select("word").distinct(), merges)
    return (
        toks.join(encoded, "word")
        .select(
            "doc_id",
            "tok_pos",
            F.posexplode(F.col("pieces")).alias("sub_pos", "piece"),
        )
        .select(
            "doc_id",
            # 10^6 sub-slots per token: the token regex is unbounded, and a
            # ~1500-char blob with few merges segments into >1000 pieces —
            # at *1000 its tail overflowed into the NEXT token's range
            # (colliding, misordered pos). A >10^6-piece token cannot
            # exist at the regex's practical lengths; keep it long math.
            (F.col("tok_pos").cast("long") * F.lit(1_000_000)
             + F.col("sub_pos")).alias("pos"),
            "piece",
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twin: K merge rounds unrolled as CTE stages
# ---------------------------------------------------------------------------

def _stage_sql(i: int, min_pair_count: int) -> str:
    """One unrolled round: pair counts over state_{i}, the argmax pair
    (empty when exhausted), and state_{i+1} via LEFT JOIN ON TRUE so an
    empty top is a no-op round (mirrors the Spark early break)."""
    return f"""
pairs_{i} AS (
  SELECT p[1] AS term_a, p[2] AS term_b, SUM(cnt) AS pair_count
  FROM (
    SELECT cnt, unnest(list_transform(range(1, len(l)),
                                      j -> [l[j], l[j + 1]])) AS p
    FROM (SELECT cnt, string_split(trim(sym), '  ') AS l FROM state_{i})
    WHERE len(l) >= 2)
  GROUP BY 1, 2),
top_{i} AS (
  SELECT term_a, term_b, pair_count FROM pairs_{i}
  WHERE pair_count >= {int(min_pair_count)}
  ORDER BY pair_count DESC, term_a ASC, term_b ASC LIMIT 1),
state_{i + 1} AS (
  SELECT s.word, s.cnt,
         CASE WHEN t.term_a IS NULL THEN s.sym
              ELSE replace(s.sym, ' ' || t.term_a || '  ' || t.term_b || ' ',
                           ' ' || t.term_a || t.term_b || ' ') END AS sym
  FROM state_{i} s LEFT JOIN top_{i} t ON TRUE)"""


def bpe_train_sql(
    table: str,
    k_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = 2,
) -> str:
    """The merge TABLE (rank, left, right, pair_count) for ``k_merges``
    unrolled rounds — the DuckDB twin of ``bpe_train``'s merge list."""
    toks = duckdb_tokens_cte(table, id_col, text_col)
    stages = ",".join(_stage_sql(i, min_pair_count) for i in range(int(k_merges)))
    unions = "\nUNION ALL\n".join(
        f"SELECT {i}::BIGINT AS rank, term_a AS lhs, term_b AS rhs, "
        f"pair_count::BIGINT AS pair_count FROM top_{i}"
        for i in range(int(k_merges))
    )
    return f"""
WITH toks AS ({toks}),
state_0 AS (
  SELECT word, cnt,
         ' ' || array_to_string(string_split(word, ''), '  ')
             || '  {EOW} ' AS sym
  FROM (SELECT term AS word, COUNT(*) AS cnt FROM toks GROUP BY term)),
{stages}
{unions}
"""


def bpe_vocab_sql(
    table: str,
    k_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = 2,
) -> str:
    """DuckDB twin of ``bpe_vocab`` over the final unrolled state."""
    toks = duckdb_tokens_cte(table, id_col, text_col)
    stages = ",".join(_stage_sql(i, min_pair_count) for i in range(int(k_merges)))
    return f"""
WITH toks AS ({toks}),
state_0 AS (
  SELECT word, cnt,
         ' ' || array_to_string(string_split(word, ''), '  ')
             || '  {EOW} ' AS sym
  FROM (SELECT term AS word, COUNT(*) AS cnt FROM toks GROUP BY term)),
{stages}
SELECT piece, SUM(cnt)::BIGINT AS cnt
FROM (SELECT cnt, unnest(string_split(trim(sym), '  ')) AS piece
      FROM state_{int(k_merges)})
GROUP BY piece
"""
