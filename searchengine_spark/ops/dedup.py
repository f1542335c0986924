"""Deduplication operators for training-data pipelines: exact (hash groupBy),
n-gram Jaccard, MinHash banding (LSH), SimHash.

Design for 100 TB:
  * exact dedup is one hash aggregation (map-side partial combine).
  * n-gram Jaccard pairs is the *verification* kernel — quadratic in the
    candidate set, so at scale it runs only on MinHash-band candidates, never
    on the full corpus. Both entry points exist; the banded pipeline is
    ``minhash_band_pairs`` → ``ngram_jaccard_pairs`` on the survivors.
  * all hashes are md5-derived so the DuckDB oracle reproduces them exactly
    (Spark ``md5``/``conv`` ≡ DuckDB ``md5``/hex-cast; verified).

Everything is built-in JVM expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import STOPWORDS, TOKEN_PATTERN, tokenize_raw_expr

ROUND_DP = 5
_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

_TOKS_SQL = (
    f"[t FOR t IN regexp_extract_all(lower({{text}}), '{TOKEN_PATTERN}') "
    f"IF t NOT IN ({_STOP_SQL})]"
)


# ---------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_md5, n_dups, keep_doc_id): one group per distinct raw text;
    keeper = min doc_id."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
    )


def exact_dedup_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT md5({text_col}) AS text_md5,
       count(*)::BIGINT AS n_dups,
       min({id_col}) AS keep_doc_id
FROM {table} GROUP BY 1
"""


# -------------------------------------------------------------- line dedup
def split_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(doc_id, line_no, line): documents exploded into separator-delimited
    lines, 0-based positions, empty lines dropped. The input shape for
    ``line_dedup``. ``sep`` is a LITERAL separator (regex-escaped before
    F.split — rejoin_lines concatenates it literally, so a metachar sep
    like '|' must split literally too or the round-trip corrupts docs)."""
    import re as _re

    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.col(text_col), _re.escape(sep))
            ).alias("line_no", "line"),
        )
        .filter(F.length("line") > 0)
    )


def line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Corpus-wide exact line/paragraph dedup (the CCNet / RefinedWeb
    boilerplate-removal pass): of every set of byte-identical lines, only
    the FIRST occurrence — smallest (doc_id, line_no) — survives. Returns
    (doc_id, line_no, line, n_dups) for the survivors; ``n_dups`` is the
    corpus-wide occurrence count (observability: how much boilerplate each
    kept line displaced).

    Scale shape: ONE hash aggregation keyed on the line digest with
    map-side partial combine — the winner struct and the count fold
    per-partition before the shuffle; no self-join, no window over the
    corpus. At 10^12 lines swap md5 for xxhash64 and drop the carried
    line text (the digest is the dedup key either way; md5 is used here
    because the DuckDB oracle reproduces it exactly)."""
    return (
        lines.groupBy(F.md5(F.col(line_col)).alias("line_md5"))
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("doc_id"),
                    F.col(line_no_col).alias("line_no"),
                )
            ).alias("w"),
            F.min(line_col).alias("line"),  # group members are identical
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("w.doc_id", "w.line_no", "line", "n_dups")
    )


def rejoin_lines(
    kept: DataFrame, sep: str, text_col: str = "text"
) -> DataFrame:
    """(doc_id, text_col): surviving (doc_id, line_no, line) rows rejoined
    per doc in original line order — the shared tail of every line-dedup
    consumer (``line_dedup_docs``, ``ops.pipeline``)."""
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col)
    )


def line_dedup_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(doc_id, text): documents with every non-first occurrence of a
    corpus-duplicated line removed, remaining lines rejoined in original
    order. A doc whose every line was boilerplate disappears."""
    kept = line_dedup(split_lines(df, id_col, text_col, sep))
    return rejoin_lines(kept, sep)


def chunk_lines(
    df: DataFrame,
    width: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, line_no, line): consecutive ``width``-token chunks of the
    whitespace token stream — the 'line' derivation for corpora without
    newlines (flat token streams); feeds ``line_dedup``."""
    chunks = F.expr(
        f"transform(sequence(0, int(ceil(size(split({text_col}, ' ')) / {width}.0)) - 1), "
        f"ci -> array_join(slice(split({text_col}, ' '), ci * {width} + 1, {width}), ' '))"
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("line_no", "line")
    ).select("doc_id", F.col("line_no").cast("long").alias("line_no"), "line")


def chunk_lines_sql(
    table: str, width: int, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``chunk_lines``."""
    return f"""
SELECT {id_col} AS doc_id, (i - 1)::BIGINT AS line_no,
       array_to_string(toks[((i - 1) * {width} + 1):((i - 1) * {width} + {width})], ' ') AS line
FROM (SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {table}),
     LATERAL (SELECT unnest(generate_series(1, (len(toks) + {width} - 1) // {width})) AS i) g
"""


def line_dedup_sql(lines_sql: str) -> str:
    """DuckDB twin over a (doc_id, line_no, line) subquery."""
    return f"""
WITH lines AS ({lines_sql}),
ranked AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn,
         count(*) OVER (PARTITION BY line)::BIGINT AS n_dups
  FROM lines)
SELECT doc_id, line_no, line, n_dups FROM ranked WHERE rn = 1
"""


# ------------------------------------------------------------------- shingles
def shingle_array(text_col, w: int = 3):
    """Column expr: word w-gram shingle array over the regex token stream
    (with repeats; empty array when the doc has fewer than w tokens)."""
    toks = tokenize_raw_expr(text_col)
    return F.when(
        F.size(toks) >= w,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - w),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(df: DataFrame, w: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word w-gram shingles per doc over the regex token stream."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingle_array(F.col(text_col), w)).alias("shingle"),
        ).distinct()
    )


def _shingles_sql(table: str, w: int, id_col: str, text_col: str) -> str:
    toks = _TOKS_SQL.format(text=text_col)
    return f"""
SELECT DISTINCT {id_col} AS doc_id,
       array_to_string(toks[i : i + {w - 1}], ' ') AS shingle
FROM (SELECT {id_col}, {toks} AS toks FROM {table}),
     unnest(range(1, greatest(len(toks) - {w} + 2, 1))) AS r(i)
"""


# ------------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    w: int = 3,
    tau: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard ≥ tau.

    With ``candidates`` (a (doc_a, doc_b) df, doc_a < doc_b — e.g.
    ``minhash_band_pairs`` output) the kernel is PAIR-DRIVEN: each candidate
    pair joins its two shingle sets directly, so cost is linear in
    Σ pair shingles — the 100 TB path. Without candidates it falls back to
    the full shingle self-join, which is quadratic in docs-per-shingle: an
    exactness baseline for small corpora, never the corpus-scale interface
    (compose with ``minhash_band_pairs`` → ``dedup_pipeline``)."""
    sh = shingles(df, w, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            candidates.select("doc_a", "doc_b")
            .join(sha, "doc_a")
            .join(shb, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, F.col("a.shingle") == F.col("b.shingle"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(j, ROUND_DP).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
    )


def ngram_jaccard_pairs_sql(
    table: str, w: int = 3, tau: float = 0.5, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    sh = _shingles_sql(table, w, id_col, text_col)
    return f"""
WITH sh AS ({sh}),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(inter / (sa.n_sh + sb.n_sh - inter), {ROUND_DP}) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter / (sa.n_sh + sb.n_sh - inter), {ROUND_DP}) >= {tau}
"""


# ------------------------------------------------------- decontamination
def contaminated_pairs(
    train: DataFrame,
    bench: DataFrame,
    w: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination for training corpora (the GPT-3 appendix-C
    / PaLM / Llama n-gram procedure): flag every training doc sharing ≥
    ``min_overlap`` distinct word w-grams with any benchmark doc. Returns
    (doc_id, bench_id, n_overlap, overlap_frac) where overlap_frac is the
    fraction of the TRAIN doc's distinct shingles that are contaminated —
    the thresholding signal (1.0 = the doc is a benchmark superset).

    Scale shape: the benchmark side is small by definition (eval sets are
    thousands of docs, the corpus is 10^12), so its shingle set broadcasts
    — the 100 TB train side is ONE map-side semi-join pass, no shuffle of
    corpus shingles. ``broadcast_bench=False`` falls back to a shuffle
    join on shingle for oversized benchmark suites. w=8 is the literature
    default; lower w only with a stopword-heavy eval set."""
    tr = shingles(train, w, id_col, text_col)
    be = shingles(bench, w, bench_id_col, bench_text_col).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    if broadcast_bench:
        be = F.broadcast(be)
    sizes = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    overlap = (
        tr.join(be, "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return overlap.join(sizes, "doc_id").select(
        "doc_id",
        "bench_id",
        "n_overlap",
        F.round(F.col("n_overlap") / F.col("n_sh"), ROUND_DP).alias("overlap_frac"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    w: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """Training corpus minus contaminated docs: anti-join ``train`` against
    the flagged ids from ``contaminated_pairs`` (same kwargs). The flagged
    side is ≤ |contaminated| ids — broadcast-small next to the corpus."""
    flagged = (
        contaminated_pairs(
            train, bench, w, min_overlap, id_col, text_col, **kw
        )
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return train.join(F.broadcast(flagged), id_col, "left_anti")


def contaminated_pairs_sql(
    train_table: str,
    bench_pred: str,
    w: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = ROUND_DP,
) -> str:
    """DuckDB twin: the benchmark is ``train_table`` rows matching
    ``bench_pred`` (driver entries synthesize the bench set from the same
    corpus deterministically)."""
    sh = _shingles_sql(train_table, w, id_col, text_col)
    return f"""
WITH sh AS ({sh}),
be AS (SELECT doc_id AS bench_id, shingle FROM sh
       WHERE {bench_pred}),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
overlap AS (
  SELECT sh.doc_id, be.bench_id, count(*)::BIGINT AS n_overlap
  FROM sh JOIN be USING (shingle)
  GROUP BY 1, 2
  HAVING count(*) >= {min_overlap})
SELECT o.doc_id AS doc_id, o.bench_id AS bench_id, o.n_overlap AS n_overlap,
       round(o.n_overlap / s.n_sh, {round_dp}) AS overlap_frac
FROM overlap o JOIN sizes s USING (doc_id)
"""


# ------------------------------------------------------------ MinHash banding
def minhash_signatures(
    df: DataFrame, n_hashes: int = 8, w: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): per-seed minimum of md5(seed || shingle) —
    lexicographic-min over hex strings is a valid MinHash family and is
    bit-identical across engines.

    Computed entirely MAP-SIDE: ``array_min(transform(shingles, md5(...)))``
    per row — no explode, no shuffle (min over repeated shingles equals min
    over the distinct set, so skipping dedup is exact). At 100 TB this is the
    difference between 0 shuffles and shuffling ~200 shingle rows per doc."""
    # NOTE: the 8 sibling transforms use SQL-parsed lambdas with UNIQUE
    # variable names (s0..s7). Python-side ``F.transform(col, lambda s: ...)``
    # gives every sibling the same lambda-variable name, and Spark 4.1 then
    # cross-binds them inside one projection → silently wrong hashes (caught
    # by the DuckDB oracle; repro kept in tests/test_entry_contract.py).
    sh = shingle_array(F.col(text_col), w)
    row = df.select(F.col(id_col).alias("doc_id"), sh.alias("sh")).filter(F.size("sh") > 0)
    mh = [
        F.expr(
            f"array_min(transform(sh, s{seed} -> md5(concat('{seed}:', s{seed}))))"
        ).alias(f"mh{seed}")
        for seed in range(n_hashes)
    ]
    return row.select("doc_id", *mh)


def minhash_band_keys(sig: "DataFrame", n_hashes: int, band_size: int) -> "DataFrame":
    """(doc_id, band, band_hash): a signature frame exploded to its LSH
    band keys — the ONE banding codec shared by pair generation, bucket
    stats, and the streaming kernel (drifting copies would silently route
    the same doc to different buckets across paths)."""
    n_bands = n_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(bi).cast("long").alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[f"mh{bi * band_size + j}" for j in range(band_size)]
                )
            ).alias("band_hash"),
        )
        for bi in range(n_bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "bk.band", "bk.band_hash")


def minhash_band_pairs(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    w: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 10_000,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band hash (band = md5 of
    ``band_size`` consecutive minhashes). Output (doc_a, doc_b) distinct.

    Single-pass bucket design (no self-join): each signature row explodes to
    its n_bands (band, band_hash) keys, one shuffle groups docs per bucket,
    and pairs are generated *inside* the bucket with array combinators — the
    expensive shingle→signature lineage is computed exactly once, versus
    2·n_bands times for the naive self-join. ``max_bucket`` caps degenerate
    buckets (near-identical boilerplate at 100 TB would otherwise go
    quadratic); capped buckets keep their ``max_bucket`` smallest doc_ids,
    and at the default the cap is unreachable at test scale, keeping the
    DuckDB oracle exact."""
    sig = minhash_signatures(df, n_hashes, w, id_col, text_col)
    exploded = minhash_band_keys(sig, n_hashes, band_size)
    buckets = exploded.groupBy("band", "band_hash").agg(
        F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_bucket).alias("ids")
    )
    # all ordered pairs (ids[i], ids[j]) with i < j, ids pre-sorted ascending
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.filter(F.size("ids") > 1)
        .select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def minhash_band_pairs_sql(
    table: str,
    n_hashes: int = 8,
    band_size: int = 2,
    w: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 10_000,
) -> str:
    """Twin of minhash_band_pairs INCLUDING the max_bucket cap (smallest
    ``max_bucket`` doc_ids per band bucket) — without mirroring the cap the
    oracle diverges on any corpus with a degenerate hot bucket."""
    sh = _shingles_sql(table, w, id_col, text_col)
    mh_cols = ", ".join(
        f"min(md5('{s}:' || shingle)) AS mh{s}" for s in range(n_hashes)
    )
    n_bands = n_hashes // band_size
    band_rows = []
    for bi in range(n_bands):
        cols = " || '|' || ".join(f"mh{bi * band_size + j}" for j in range(band_size))
        band_rows.append(f"SELECT doc_id, {bi} AS band, md5({cols}) AS band_hash FROM sig")
    bands = " UNION ALL ".join(band_rows)
    return f"""
WITH sh AS ({sh}),
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({bands}),
ranked AS (
  SELECT doc_id, band, band_hash,
         row_number() OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS rn
  FROM bands)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM ranked a JOIN ranked b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
WHERE a.rn <= {max_bucket} AND b.rn <= {max_bucket}
"""


def band_bucket_stats(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    w: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 10_000,
) -> DataFrame:
    """(band, band_hash, n_docs, capped): observability twin of
    ``minhash_band_pairs`` — no silent caps. A bucket with n_docs >
    ``max_bucket`` has its candidate pairs truncated to the smallest doc_ids;
    run this (or ``dedup_pipeline(..., log_capped=True)``) to see how many
    buckets the approximation touched before trusting the pair set."""
    sig = minhash_signatures(df, n_hashes, w, id_col, text_col)
    exploded = minhash_band_keys(sig, n_hashes, band_size)
    return (
        exploded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("capped", F.col("n_docs") > max_bucket)
    )


# --------------------------------------------------- components + pipeline
def _checkpointer(spark, checkpoint_dir: str | None):
    """Per-round lineage truncation for iterative algorithms (components,
    pagerank): ``localCheckpoint`` by default (fast, executor-local — one
    lost executor kills a long run), or RELIABLE ``checkpoint`` into
    ``checkpoint_dir`` (fault-tolerant storage — the 10^12-edge mode)."""
    if checkpoint_dir is not None:
        # NOTE: setCheckpointDir is CONTEXT-GLOBAL — only repoint it when it
        # differs, so an application that already owns a (possibly more
        # fault-tolerant) checkpoint dir keeps it for its own checkpoints
        sc = spark.sparkContext
        current = sc.getCheckpointDir()
        if current is None or current.rstrip("/") != checkpoint_dir.rstrip("/"):
            if current is not None:
                import logging

                logging.getLogger(__name__).warning(
                    "repointing the context checkpoint dir %s -> %s "
                    "(setCheckpointDir is global; later df.checkpoint() "
                    "calls in this application follow it)",
                    current,
                    checkpoint_dir,
                )
            sc.setCheckpointDir(checkpoint_dir)

        def ck(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def ck(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    return ck


def dedup_components(
    pairs: DataFrame, max_iter: int = 20, checkpoint_dir: str | None = None
) -> DataFrame:
    """Connected components over duplicate pairs → keeper assignment:
    (doc_id, keep_doc_id) with keep_doc_id = min doc_id of the component.

    Iterative min-label propagation in DataFrames: each round every node
    takes the min of its own and its neighbours' labels; a checkpoint
    truncates the lineage each round (an iterative self-join otherwise
    doubles the plan per iteration). Convergence = Σ labels stops decreasing
    (labels are monotone non-increasing), checked with one tiny agg per
    round. Duplicate clusters have small diameter in practice, so rounds
    ≈ 3-5.

    Durability: the default ``localCheckpoint`` stores blocks on executors —
    fast, but one lost executor kills a long run. Pass ``checkpoint_dir``
    (HDFS/S3 path on a cluster) for RELIABLE checkpoints: each round's
    labels are written to fault-tolerant storage and the lineage is cut
    there, so the run survives executor loss — the required mode at 10^12
    edges. Same output either way (pytest-pinned)."""
    spark = pairs.sparkSession
    ck = _checkpointer(spark, checkpoint_dir)
    edges = pairs.select("doc_a", "doc_b")
    sym = ck(
        edges.union(
            edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
    )  # materialize ONCE — every propagation round joins
    # against sym, and without this the full upstream pipeline (banding +
    # jaccard verification) would re-run per round
    labels = ck(
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    # convergence checksum over xxhash64(label): works for STRING doc ids
    # (URLs/UUIDs) too — F.sum over a string label is NULL (or an ANSI
    # cast error), and NULL == NULL would end the loop after one round
    # with partially-propagated labels
    chksum = lambda frame: frame.agg(
        F.sum(F.xxhash64("label").cast("decimal(38,0)"))
    ).collect()[0][0]
    prev_sum = chksum(labels)
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(F.col("doc_id").alias("doc_b"), "label"), "doc_b"
            )
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_label"))
            .select(F.col("doc_a").alias("doc_id"), "nbr_label")
        )
        labels = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping (path halving): label ← label(label). Min-labels
        # only decrease, so this is exact and turns diameter-bound rounds
        # into log-bound rounds on chain-shaped duplicate clusters.
        hop = labels.select(F.col("doc_id").alias("label"), F.col("label").alias("gl"))
        labels = ck(
            labels.join(hop, "label", "left")
            .select("doc_id", F.coalesce(F.col("gl"), F.col("label")).alias("label"))
        )
        cur_sum = chksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("doc_id", F.col("label").alias("keep_doc_id"))


def dedup_pipeline(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    w: int = 3,
    tau: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 10_000,
    log_capped: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The dedup operator a training-data user actually runs, end to end:
    MinHash-LSH banding (candidate generation, single shuffle) → pair-driven
    n-gram Jaccard ≥ tau (verification, linear in candidate pairs) →
    connected components (keeper assignment). Output (doc_id, keep_doc_id)
    for every doc in a verified duplicate cluster; anti-join
    ``doc_id != keep_doc_id`` rows against the corpus to drop duplicates.
    No full-corpus self-join anywhere (plan-tested). ``checkpoint_dir``
    switches the component rounds to reliable checkpoints (see
    ``dedup_components``) — required for executor-loss survival at scale."""
    cand = minhash_band_pairs(
        df, n_hashes, band_size, w, id_col, text_col, max_bucket
    )
    if log_capped:
        import logging

        n_capped = (
            band_bucket_stats(df, n_hashes, band_size, w, id_col, text_col, max_bucket)
            .filter(F.col("capped"))
            .count()
        )
        if n_capped:
            logging.getLogger(__name__).warning(
                "minhash banding capped %d bucket(s) at max_bucket=%d — "
                "candidate pairs are approximate for those buckets",
                n_capped,
                max_bucket,
            )
    verified = ngram_jaccard_pairs(df, w, tau, id_col, text_col, candidates=cand)
    return dedup_components(
        verified.select("doc_a", "doc_b"), checkpoint_dir=checkpoint_dir
    )


def reassign_keepers(
    assignments: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Curation-policy layer over ``dedup_components``' structural output:
    re-pick each duplicate cluster's keeper as its HIGHEST-``score_col``
    member (ties → smallest doc_id) instead of the smallest id. The
    min-label keeper is an artifact of label propagation; a training-data
    pipeline usually wants to keep the best-quality copy (longest, highest
    quality_score, most recent) — this is that policy, applied as one
    window over the |duplicate-set| rows, so corpus cost is zero.

    ``assignments``: (doc_id, keep_doc_id) from ``dedup_pipeline`` /
    ``dedup_components``. ``scores``: (doc_id, score) — any per-doc
    ranking signal (e.g. ``textstats.quality_score``). Docs missing from
    ``scores`` rank below every scored member (score −inf) but keep their
    id tie-break. Output: same (doc_id, keep_doc_id) shape with keepers
    re-pointed; component membership is untouched."""
    from pyspark.sql import Window

    lab = assignments.join(
        scores.select(
            F.col(id_col).alias("doc_id"), F.col(score_col).alias("_s")
        ),
        "doc_id",
        "left",
    ).withColumn("_s", F.coalesce(F.col("_s"), F.lit(float("-inf"))))
    w = Window.partitionBy("keep_doc_id").orderBy(
        F.desc("_s"), F.asc("doc_id")
    )
    best = (
        lab.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("keep_doc_id"), F.col("doc_id").alias("new_keeper"))
    )
    return (
        assignments.join(best, "keep_doc_id")
        .select("doc_id", F.col("new_keeper").alias("keep_doc_id"))
    )


def dedup_pipeline_sql(
    table: str,
    n_hashes: int = 8,
    band_size: int = 2,
    w: int = 3,
    tau: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 10_000,
) -> str:
    """Oracle twin of ``dedup_pipeline``: banding (with the same max_bucket
    cap) + pair-driven Jaccard + transitive closure via a recursive CTE,
    keeper = min(doc) per component."""
    sh = _shingles_sql(table, w, id_col, text_col)
    mh_cols = ", ".join(f"min(md5('{s}:' || shingle)) AS mh{s}" for s in range(n_hashes))
    n_bands = n_hashes // band_size
    band_rows = []
    for bi in range(n_bands):
        cols = " || '|' || ".join(f"mh{bi * band_size + j}" for j in range(band_size))
        band_rows.append(f"SELECT doc_id, {bi} AS band, md5({cols}) AS band_hash FROM sig")
    bands = " UNION ALL ".join(band_rows)
    return f"""
WITH RECURSIVE sh AS ({sh}),
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({bands}),
ranked AS (
  SELECT doc_id, band, band_hash,
         row_number() OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS rn
  FROM bands),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ranked a JOIN ranked b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  WHERE a.rn <= {max_bucket} AND b.rn <= {max_bucket}),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
verified AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(inter / (sa.n_sh + sb.n_sh - inter), {ROUND_DP}) >= {tau}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM verified
  UNION SELECT doc_b, doc_a FROM verified),
reach(doc, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT reach.doc, e.b FROM reach JOIN edges e ON e.a = reach.r)
SELECT doc AS doc_id, min(r) AS keep_doc_id FROM reach GROUP BY 1
"""


# ----------------------------------------------------------------- SimHash
SIMHASH_BITS = 60  # 15 md5 hex chars → fits signed int64 in both engines


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit tf-weighted SimHash over the token stream.
    term hash = int(md5(term)[:15], 16) — reproducible in SQL."""
    toks = tokenize_raw_expr(F.col(text_col))
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"))
    )
    bits = tf.select(
        "doc_id", "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit")
    )
    # shiftright/shiftleft builtins require a literal shift → use SQL exprs,
    # which accept a column shift amount (still whole-stage codegen).
    vote = F.sum(
        F.when(F.expr("(h >> cast(bit as int)) & 1") == 1, F.col("tf")).otherwise(-F.col("tf"))
    )
    per_bit = bits.groupBy("doc_id", "bit").agg(vote.alias("vote"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(cast(1 as bigint), cast(bit as int))"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = _TOKS_SQL.format(text=text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
  FROM toks GROUP BY doc_id, term),
bits AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS vote
  FROM tf, unnest(range(0, {SIMHASH_BITS})) AS r(bit)
  GROUP BY doc_id, bit)
SELECT doc_id,
       sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""


def simhash_mapside(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bit-identical twin of ``simhash`` computed as ONE narrow projection
    — no groupBy, no shuffle (a doc's signature depends only on its own
    text, so the two hash aggregations of the relational form are
    replaceable by nested array combinators). This is the STREAMING-safe
    form: Structured Streaming forbids an aggregation in front of a
    stateful operator in append mode, and at batch scale it turns the
    signature stage into pure scan-speed column math. SQL-parsed lambdas
    (unique variable names) — the PySpark 4.1 sibling-lambda cross-binding
    pitfall doesn't apply."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            tokenize_raw_expr(F.col(text_col)).alias("_toks"),
        )
        .withColumn(
            "_pairs",
            F.expr(
                "transform(array_distinct(_toks), t -> struct("
                "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) as h, "
                "cast(size(filter(_toks, x -> x = t)) as bigint) as tf))"
            ),
        )
        .withColumn(
            "simhash",
            F.expr(
                f"aggregate(sequence(0, {SIMHASH_BITS - 1}), cast(0 as bigint), "
                "(acc, b) -> acc + IF("
                "aggregate(_pairs, cast(0 as bigint), "
                "(a, p) -> a + IF(((p.h >> b) & 1) = 1, p.tf, -p.tf)) > 0, "
                "shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
            ),
        )
        .select("doc_id", "simhash")
    )


def _simhash_bands(d: int) -> list[tuple[int, int, int]]:
    """(band, start_bit, width) decomposition of the 60-bit signature into
    d+1 contiguous bands. Pigeonhole: two signatures within Hamming
    distance d differ in ≤ d bands, so they agree EXACTLY on at least one
    of the d+1 — band equality is a lossless blocking key (Manku, Jain &
    Sarma, WWW'07 §3). Remainder bits widen the leading bands by 1."""
    n_bands = d + 1
    base, rem = divmod(SIMHASH_BITS, n_bands)
    out, start = [], 0
    for bi in range(n_bands):
        width = base + (1 if bi < rem else 0)
        out.append((bi, start, width))
        start += width
    return out


def simhash_neardup(
    df: DataFrame | None = None,
    d: int = 3,
    *,
    signatures: DataFrame | None = None,
    max_bucket: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``d`` — the
    Manku/Jain/Sarma WWW'07 web-dedup design, relational form. Output
    (doc_a, doc_b, hamming), doc_a < doc_b, exact (blocking is lossless):
    the 60-bit signature splits into d+1 bit-bands; a pair within distance
    d MUST agree exactly on ≥1 band (pigeonhole), so candidates come from
    d+1 band-value equi-buckets — never an all-pairs join — and one
    ``bit_count(xor)`` verifies the exact distance.

    Same single-pass bucket shape as ``minhash_band_pairs``: signatures
    computed ONCE, exploded to (band, band_val) keys, pairs generated
    inside the bucket with array combinators (signature rides along, so
    verification needs no join back). ``max_bucket`` caps degenerate
    buckets (keeps the smallest doc_ids — at 100 TB a boilerplate band
    value would otherwise go quadratic); the default is unreachable at
    test scale so the DuckDB twin stays exact. At scale the bucket
    cardinality is ~(d+1)·N over ~2^15-value keys per band — a uniform
    shuffle, no hot keys beyond what the cap bounds."""
    sig = signatures if signatures is not None else simhash(df, id_col, text_col)
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.expr(
                f"(simhash >> {start}) & {(1 << width) - 1}"
            ).alias("band_val"),
        )
        for bi, start, width in _simhash_bands(d)
    ]
    exploded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "simhash", "bk.band", "bk.band_val")
    buckets = exploded.groupBy("band", "band_val").agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))),
            1,
            max_bucket,
        ).alias("rows")
    )
    pairs = F.flatten(
        F.transform(
            F.col("rows"),
            lambda x, i: F.transform(
                F.slice(F.col("rows"), i + 2, F.size(F.col("rows"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    x["simhash"].alias("sh_a"),
                    y["doc_id"].alias("doc_b"),
                    y["simhash"].alias("sh_b"),
                ),
            ),
        )
    )
    return (
        buckets.filter(F.size("rows") > 1)
        .select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.sh_a", "p.sh_b")
        .distinct()
        .withColumn("hamming", F.expr("cast(bit_count(sh_a ^ sh_b) as bigint)"))
        .filter(F.col("hamming") <= d)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_neardup_sql(
    table: str,
    d: int = 3,
    max_bucket: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``simhash_neardup`` INCLUDING the max_bucket cap
    (smallest doc_ids per band bucket), band decomposition, and the exact
    bit_count(xor) verification."""
    band_vals = ", ".join(
        f"({bi}, {start}, {width})" for bi, start, width in _simhash_bands(d)
    )
    return f"""
WITH sig AS ({simhash_sql(table, id_col, text_col)}),
bands(band, start, width) AS (VALUES {band_vals}),
keys AS (
  SELECT doc_id, simhash, band,
         (simhash >> start) & ((1::BIGINT << width) - 1) AS band_val
  FROM sig, bands),
ranked AS (
  SELECT doc_id, simhash, band, band_val,
         row_number() OVER (PARTITION BY band, band_val ORDER BY doc_id) AS rn
  FROM keys),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                  b.doc_id AS doc_b, b.simhash AS sh_b
  FROM ranked a JOIN ranked b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
  WHERE a.rn <= {max_bucket} AND b.rn <= {max_bucket})
SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {d}
"""


# ----------------------------------------------- exact duplicate spans
def positional_shingles(
    df: DataFrame, w: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, shingle) word w-grams WITH their 0-based token
    position (repeats kept) — the seed stream for exact-substring span
    detection."""
    arr = shingle_array(F.col(text_col), w)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(arr).alias("pos", "shingle"),
    )


def duplicate_spans(
    df: DataFrame,
    w: int = 8,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Maximal duplicated token runs across document pairs — the exact-
    substring dedup primitive from "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2022), re-expressed relationally
    instead of via a suffix array: (doc_a, doc_b, start_a, start_b,
    span_len) for every maximal run of ≥ min_len tokens (default w) that
    appears verbatim in both docs, with 0-based token offsets.

    How: stride-1 positional w-gram shingles; equal shingles across a pair
    seed (pos_a, pos_b) matches; a duplicated run of L tokens yields
    L−w+1 seeds on one DIAGONAL (pos_a − pos_b constant), so maximal runs
    are gaps-and-islands per (pair, diagonal): consecutive pos_a ⇔
    pos_a − row_number constant. Pure window + agg — no suffix array, no
    per-pair Python.

    Scale: with ``candidates`` (e.g. MinHash band survivors) the seed join
    is pair-driven — linear in Σ pair shingles, the 100 TB path. Without
    it the full shingle self-join is quadratic in docs-per-shingle;
    ``max_shingle_df`` drops shingles hotter than the cap first (the
    standard guard — boilerplate w-grams shared by thousands of docs cost
    the most and carry no pair signal; dropping one can only SPLIT a
    reported span, never invent one). The islands window partitions by
    (pair, diagonal) — output-bounded, never corpus-bounded."""
    if min_len is None:
        min_len = w
    ps = positional_shingles(df, w, id_col, text_col)
    if max_shingle_df is not None:
        hot = (
            ps.groupBy("shingle")
            .agg(F.count_distinct("doc_id").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        ps = ps.join(F.broadcast(hot), "shingle", "left_anti")
    pa = ps.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "shingle"
    )
    pb = ps.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "shingle"
    )
    if candidates is not None:
        seeds = (
            candidates.select("doc_a", "doc_b")
            .join(pa, "doc_a")
            .join(pb, ["doc_b", "shingle"])
        )
    else:
        seeds = pa.join(pb, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
    from pyspark.sql import Window

    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    seeds = seeds.select("doc_a", "doc_b", "pos_a", "pos_b", diag).distinct()
    win = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = seeds.withColumn("grp", F.col("pos_a") - F.row_number().over(win))
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.count(F.lit(1)) + w - 1).alias("span_len"),
        )
        .filter(F.col("span_len") >= min_len)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_len")
    )


def _positional_shingles_sql(table: str, w: int, id_col: str, text_col: str) -> str:
    toks = _TOKS_SQL.format(text=text_col)
    return f"""
SELECT {id_col} AS doc_id, i - 1 AS pos,
       array_to_string(toks[i : i + {w - 1}], ' ') AS shingle
FROM (SELECT {id_col}, {toks} AS toks FROM {table}),
     unnest(range(1, greatest(len(toks) - {w} + 2, 1))) AS r(i)
"""


def duplicate_spans_sql(
    table: str = "documents",
    w: int = 8,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``duplicate_spans`` (full self-join form)."""
    if min_len is None:
        min_len = w
    ps = _positional_shingles_sql(table, w, id_col, text_col)
    return f"""
WITH ps AS ({ps}),
seeds AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
  FROM ps a JOIN ps b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
runs AS (
  SELECT doc_a, doc_b, diag, pos_a, pos_b,
         pos_a - row_number() OVER (
             PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
  FROM seeds)
SELECT doc_a, doc_b,
       min(pos_a)::BIGINT AS start_a, min(pos_b)::BIGINT AS start_b,
       (count(*) + {w} - 1)::BIGINT AS span_len
FROM runs
GROUP BY doc_a, doc_b, diag, grp
HAVING count(*) + {w} - 1 >= {min_len}
"""


def scrub_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove duplicated spans from the LATER doc of each pair (doc_b —
    ids order survivors deterministically, same convention as
    ``dedup_pipeline`` keepers): tokens of doc_b covered by any
    (start_b, span_len) interval are dropped and the text rebuilt from
    the kept tokens, in order. Output is the normalized token stream for
    every doc (spans are token-indexed, so the rebuild must be too); docs
    with no spans keep all their tokens.

    Relational shape: spans → per-doc covered positions (explode the
    interval — output-bounded), tokens → posexplode, left_anti on
    (doc, pos), re-aggregate ordered. No per-row Python."""
    covered = (
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.explode(
                F.sequence(
                    F.col("start_b"), F.col("start_b") + F.col("span_len") - 1
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_raw_expr(F.col(text_col))).alias("pos", "tok"),
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"])
        ).alias("scrubbed")
    )
    # output is the normalized token stream for every doc (docs with no
    # spans keep all their tokens); a null after the left join means the
    # doc kept NO tokens (fully covered, or tokenless) → empty string
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(rebuilt, "doc_id", "left").select(
        F.col("doc_id").alias(id_col),
        F.coalesce(F.col("scrubbed"), F.lit("")).alias("scrubbed_text"),
    )
