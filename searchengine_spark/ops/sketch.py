"""Distributed sketches for streaming-scale term statistics.

Count-Min Sketch over the corpus term stream: d hash rows × w counters,
estimate(term) = min over rows of its counter — always ≥ the true count,
within εN with probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ (Cormode &
Muthukrishnan 2005). The sketch here is a (row, col, count) TABLE, not a
driver-side array: at 10^12 tokens the counters build with d hash
aggregations (map-side combine — the shuffle moves d·w partial rows, not
the token stream), merge across corpora/epochs by summing counters
(sketch linearity), and stay queryable with a broadcast-sized join.

Hashes are md5-derived (like ``ops.dedup`` MinHash) so the DuckDB twin
reproduces every counter bit-for-bit — determinism is what makes an
APPROXIMATE structure exactly testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import tokenize_raw_expr

_HEX = 12  # 48 bits of md5 → exact in a signed 64-bit int


def _col_expr(term_col, row: int, width: int):
    h = F.md5(F.concat_ws(":", F.lit(str(row)), term_col))
    return F.pmod(
        F.conv(F.substring(h, 1, _HEX), 16, 10).cast("long"), F.lit(width)
    )


def cms_build(
    df: DataFrame,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """(row, col, cnt): Count-Min counters over the duplicate-preserving
    token stream of ``text_col``. d hash aggregations, each map-side
    combined; output is d·w rows max (broadcast-sized for any practical
    sketch)."""
    toks = df.select(
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term")
    )
    parts = [
        toks.groupBy(_col_expr(F.col("term"), r, width).alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(r).alias("row"), "col", "cnt")
        for r in range(depth)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cms_estimate(
    cms: DataFrame,
    terms: list[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(term, est): point estimates for ``terms`` — min over the d rows of
    each term's counter (missing counter = 0). The terms side is a
    |terms|·d literal frame; the sketch side is broadcast-sized."""
    spark = cms.sparkSession
    probe_rows = []
    import hashlib

    for t in terms:
        for r in range(depth):
            h = hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:_HEX]
            probe_rows.append((t, r, int(h, 16) % width))
    probes = spark.createDataFrame(probe_rows, "term string, row int, col long")
    return (
        probes.join(cms, ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_build_sql(
    table: str,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``cms_build`` — same md5 hash family, counter-exact."""
    from ..tokenizer import STOPWORDS, TOKEN_PATTERN

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = (
        f"SELECT unnest([t FOR t IN regexp_extract_all(lower({text_col}), "
        f"'{TOKEN_PATTERN}') IF t NOT IN ({stops})]) AS term FROM {table}"
    )
    rows = " UNION ALL ".join(
        f"SELECT {r} AS row, "
        f"CAST(('0x' || substring(md5('{r}:' || term), 1, {_HEX})) AS BIGINT) "
        f"% {width} AS col, count(*)::BIGINT AS cnt "
        f"FROM toks GROUP BY 2"
        for r in range(depth)
    )
    return f"WITH toks AS ({toks})\n{rows}"


def stream_cms(
    spark,
    source_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
    schema: str = "doc_id long, text string",
):
    """Streaming sketch maintenance: each micro-batch's counters land in
    ``sketch_dir/epoch=<id>/`` (OVERWRITE per epoch — a replayed batch
    after crash rewrites the same directory, so the fold stays exact),
    and ``read_cms`` folds the epochs by counter addition (linearity).
    History is never re-scanned. Returns the StreamingQuery."""

    def fold(batch_df, epoch_id: int) -> None:
        (
            cms_build(batch_df, depth, width, text_col)
            .write.mode("overwrite")
            .parquet(f"{sketch_dir}/epoch={epoch_id}")
        )

    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_cms(spark, sketch_dir: str) -> DataFrame:
    """(row, col, cnt): the folded sketch across every stream epoch."""
    return (
        spark.read.parquet(sketch_dir)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


# ------------------------------------------------------- histogram sketch
def hist_build(
    df: DataFrame,
    value_col: str = "value",
    bin_width: float = 1.0,
) -> DataFrame:
    """(bin, cnt): fixed-width histogram of a numeric column — the
    mergeable quantile sketch (like the CMS, a TABLE: map-side-combined
    hash agg; merge across corpora/epochs = counter sum). Bin = floor
    (value / width); estimate error is bounded by one bin width."""
    b = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("long")
    return df.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias("cnt"))


def hist_quantile(
    hist: DataFrame, q: float, bin_width: float = 1.0
) -> float:
    """Quantile estimate from the histogram: the LOWER EDGE of the first
    bin whose cumulative count reaches ceil(q·N) (the inverted-CDF /
    'lower' interpolation — deterministic, engine-portable). One
    collect of the (tiny) histogram."""
    if not 0.0 < q <= 1.0:
        raise ValueError("q must be in (0, 1]")
    rows = sorted((r["bin"], r["cnt"]) for r in hist.collect())
    total = sum(c for _, c in rows)
    if total == 0:
        raise ValueError("empty histogram")
    need = -(-q * total // 1)  # ceil
    acc = 0
    for b, c in rows:
        acc += c
        if acc >= need:
            return b * bin_width
    return rows[-1][0] * bin_width


def hist_build_sql(
    table: str, value_col: str = "value", bin_width: float = 1.0
) -> str:
    """DuckDB twin of ``hist_build``."""
    return f"""
SELECT floor({value_col} / {float(bin_width)!r})::BIGINT AS bin,
       count(*)::BIGINT AS cnt
FROM {table} GROUP BY 1
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (mergeable register table)
# ---------------------------------------------------------------------------

_HLL_BITS = 48 - 0  # md5 12-hex prefix → 48 usable hash bits


def _hll_parts(value_col, p: int):
    """(bucket, rho) for one value: bucket = h mod 2^p, rho = 1-based
    position of the first set bit in the REMAINING (48-p)-bit quotient,
    counted from the MSB — computed with integer/string ops only
    (lpad(bin(w))) so Spark and DuckDB agree bit-for-bit (no float log2,
    whose last-ulp rounding differs across engines)."""
    m = 1 << p
    wbits = _HLL_BITS - p
    h = F.conv(F.substring(F.md5(value_col.cast("string")), 1, _HEX), 16, 10).cast(
        "long"
    )
    bucket = F.pmod(h, F.lit(m))
    w = (h / F.lit(m)).cast("long")  # quotient — the remaining 36 bits
    binstr = F.lpad(F.bin(w), wbits, "0")
    pos = F.instr(binstr, "1")
    rho = F.when(pos == 0, wbits + 1).otherwise(pos)
    return bucket, rho


def hll_build(
    df: DataFrame, value_col: str = "term", p: int = 12
) -> DataFrame:
    """(bucket, rho): HyperLogLog registers over a column — distinct-count
    sketch as a TABLE of ≤2^p rows (Flajolet et al. 2007). One map-side-
    combined max aggregation; merge across corpora/epochs/streams =
    ``hll_merge`` (register-wise max — sketch idempotence means replays
    and overlaps are free). At 10^12 rows the shuffle carries ≤2^p rows
    per partial, never the value stream."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    bucket, rho = _hll_parts(F.col(value_col), p)
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union-merge two register tables (max per bucket) — the sketch of
    the UNION of the two underlying sets, exactly."""
    return a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho"))


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """One row (est): the HLL cardinality estimate with the standard
    small-range (linear-counting) correction. The register sum is kept
    INTEGER-exact — Σ 2^(rmax−rho) with rmax = 37 fits a BIGINT — so the
    estimate is independent of aggregation order and identical across
    engines; only the final division is floating point (rounded 4dp)."""
    m = 1 << p
    wbits = _HLL_BITS - p
    rmax = wbits + 1
    alpha = _hll_alpha(m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("used"),
        # coalesce: an EMPTY register table (empty corpus / pre-first-epoch
        # stream) sums to NULL, which would null the whole estimate; with
        # 0 the linear-counting branch correctly yields est = 0
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), (F.lit(rmax) - F.col("rho"))).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("s_int"),
    )
    scale = float(1 << rmax)
    est_raw = (
        F.lit(alpha * m * m * scale)
        / (F.col("s_int") + (F.lit(m) - F.col("used")) * F.lit(scale))
    )
    zeros = F.lit(m) - F.col("used")
    est = F.when(
        (est_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(est_raw)
    return agg.select(F.round(est, 4).alias("est"))


def hll_build_sql(table: str, value_col: str = "term", p: int = 12) -> str:
    """DuckDB twin of ``hll_build`` — identical md5/bin/instr arithmetic."""
    m = 1 << p
    wbits = _HLL_BITS - p
    h = (
        f"CAST(('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, {_HEX}))"
        f" AS BIGINT)"
    )
    pos = f"strpos(lpad(bin({h} // {m}), {wbits}, '0'), '1')"
    return f"""
SELECT ({h} % {m})::BIGINT AS bucket,
       MAX(CASE WHEN {pos} = 0 THEN {wbits + 1} ELSE {pos} END)::INTEGER AS rho
FROM {table}
GROUP BY 1
"""


def hll_estimate_sql(registers_sql: str, p: int = 12) -> str:
    """DuckDB twin of ``hll_estimate`` over a register-table subquery."""
    m = 1 << p
    wbits = _HLL_BITS - p
    rmax = wbits + 1
    alpha = _hll_alpha(m)
    scale = float(1 << rmax)
    return f"""
WITH r AS ({registers_sql}),
agg AS (SELECT COUNT(*) AS used,
               COALESCE(SUM((2.0 ** ({rmax} - rho))::BIGINT)::BIGINT, 0) AS s_int
        FROM r)
SELECT ROUND(CASE WHEN {alpha * m * m}::DOUBLE * {scale!r}
                       / (s_int + ({m} - used) * {scale!r}) <= {2.5 * m}
                  AND ({m} - used) > 0
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - used))
             ELSE {alpha * m * m}::DOUBLE * {scale!r}
                  / (s_int + ({m} - used) * {scale!r}) END, 4) AS est
FROM agg
"""


def stream_hll(
    spark,
    source_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    p: int = 12,
    text_col: str = "text",
    schema: str = "doc_id long, text string",
):
    """Streaming HLL maintenance over the token stream: each micro-batch's
    registers land in ``sketch_dir/epoch=<id>/`` (overwrite per epoch →
    replays after crash rewrite the same directory) and ``read_hll`` folds
    them by per-bucket max — which, unlike the CMS counter SUM, is also
    IDEMPOTENT, so even a duplicated epoch directory cannot skew the
    estimate. History is never re-scanned. Returns the StreamingQuery."""
    from ..tokenizer import tokenize_raw_expr

    def fold(batch_df, epoch_id: int) -> None:
        toks = batch_df.select(
            F.explode(tokenize_raw_expr(F.col(text_col))).alias("term")
        )
        (
            hll_build(toks, "term", p=p)
            .write.mode("overwrite")
            .parquet(f"{sketch_dir}/epoch={epoch_id}")
        )

    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_hll(spark, sketch_dir: str) -> DataFrame:
    """(bucket, rho): the folded registers across every stream epoch."""
    return (
        spark.read.parquet(sketch_dir)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


# ---------------------------------------------------------------------------
# Heavy hitters: distributed top-k with an EXACTNESS CERTIFICATE.
#
# The scale problem: exact top-k terms needs a groupBy over every distinct
# key — at 10^12 tokens the shuffle carries the whole vocabulary. The
# classic fix (Misra-Gries / SpaceSaving) keeps a truncated summary per
# worker and merges summaries; the cost is an error bound instead of an
# exact answer. This implementation gets BOTH: per-arrow-batch truncated
# exact summaries (top-m by local count, plus the largest DROPPED count as
# that batch's miss bound), a candidate union + error budget E = Σ batch
# bounds, then ONE exact aggregation restricted to the candidate set
# (broadcast semi-join — the shuffle carries ≤ m·batches keys, not the
# vocabulary). If the k-th verified count exceeds E, no non-candidate can
# outrank it and the result is PROVABLY the exact top-k; otherwise the
# optional fallback recomputes the full exact aggregation (correctness
# never depends on the data's skew).
# ---------------------------------------------------------------------------


_HH_SUMMARY_SCHEMA = "item string, cnt long, thr long"


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 10,
    m: int = 256,
    weight_col: str | None = None,
    exact_fallback: bool = True,
):
    """Top-k items by (weighted) count with an exactness certificate.

    Returns ``(topk_df, info)`` where topk_df is (item, cnt, rank) —
    rank over (cnt desc, item asc) — and info is
    ``{"certified": bool, "e_bound": int, "n_candidates": int,
    "fallback": bool}``. ``m`` is the per-batch summary width: larger m →
    bigger candidate union, smaller miss bound E, more likely certified.

    Scale shape: pass 1 is a narrow mapInPandas (no shuffle) emitting
    ≤ m+1 rows per arrow batch; the candidate union and E are one tiny
    aggregation over those summaries; pass 2 is a hash agg over the
    broadcast-semi-joined candidate rows only. The full-vocabulary
    shuffle happens ONLY in the (data-dependent) fallback."""
    import pandas as pd

    if k <= 0 or m <= 0:
        raise ValueError("k and m must be positive")
    w = weight_col

    def summarize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if w is None:
                counts = pdf[item_col].value_counts()
            else:
                # the certificate arithmetic (long counts, Σ thr bound) is
                # integer — a fractional weight would TRUNCATE the miss
                # bound and could certify a wrong top-k; refuse loudly
                if (pdf[w] % 1 != 0).any():
                    raise ValueError(
                        "heavy_hitters requires integer weights "
                        f"(fractional values in {w!r}); scale them to "
                        "integers upstream"
                    )
                counts = pdf.groupby(item_col)[w].sum()
                counts = counts.sort_values(ascending=False)
            top = counts.iloc[:m]
            thr = int(counts.iloc[m]) if len(counts) > m else 0
            yield pd.DataFrame(
                {
                    "item": list(top.index) + [None],
                    "cnt": list(top.astype("int64")) + [0],
                    "thr": [0] * len(top) + [thr],
                }
            )

    cols = [item_col] + ([w] if w else [])
    # persisted: the summary pass is read three times (E/candidate-count
    # agg, candidate distinct, and the verify join's broadcast side) — one
    # mapInPandas scan instead of three; ≤ (m+1)·batches tiny rows
    summaries = (
        df.select(*cols).mapInPandas(summarize, schema=_HH_SUMMARY_SCHEMA)
        .persist()
    )
    stats = summaries.agg(
        F.sum("thr").alias("e"),
        F.count(F.when(F.col("item").isNotNull(), 1)).alias("nc"),
    ).collect()[0]
    e_bound = int(stats["e"] or 0)
    cand = summaries.filter(F.col("item").isNotNull()).select("item").distinct()

    wexpr = F.sum(F.col(w)).cast("long") if w else F.count(F.lit(1)).cast("long")
    exact = (
        df.join(F.broadcast(cand), df[item_col] == cand["item"], "left_semi")
        .groupBy(F.col(item_col).alias("item"))
        .agg(wexpr.alias("cnt"))
    )
    top_rows = exact.orderBy(F.desc("cnt"), F.asc("item")).limit(k).collect()
    n_candidates = int(cand.count())
    kth = int(top_rows[-1]["cnt"]) if len(top_rows) >= k else 0
    certified = e_bound == 0 or (len(top_rows) >= k and kth > e_bound)

    info = {
        "certified": bool(certified),
        "e_bound": e_bound,
        "n_candidates": n_candidates,
        "fallback": False,
    }
    spark = df.sparkSession
    if not certified and exact_fallback:
        full = df.groupBy(F.col(item_col).alias("item")).agg(wexpr.alias("cnt"))
        top_rows = full.orderBy(F.desc("cnt"), F.asc("item")).limit(k).collect()
        info["fallback"] = True
        info["certified"] = True
    summaries.unpersist()
    out = spark.createDataFrame(
        [(r["item"], int(r["cnt"]), i + 1) for i, r in enumerate(top_rows)]
        or [],
        "item string, cnt long, rank long",
    )
    return out, info
