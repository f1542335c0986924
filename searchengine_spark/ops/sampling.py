"""Deterministic hash-based sampling for training-data curation: the
"mix your corpus to target proportions" step of every LLM data pipeline
(domain/language rebalancing, quality-tier downsampling).

Why not ``DataFrame.sample``: Spark's sampler is seeded per-partition, so
the selected SET changes with partitioning, task retries, and cluster
size — unacceptable for a reproducible training corpus. Here membership
is a pure function of the ROW ID: md5(id || seed) mapped to [0, 1) and
thresholded. The same row is selected at any parallelism, on any engine
(the DuckDB twin reproduces the exact set), and adjusting the rate up
keeps previously selected rows selected (nested samples — rate 0.1 ⊂
rate 0.2 for the same seed), which is what incremental corpus scaling
needs.

Scale shape: selection is a stateless JVM-side filter (md5 + substring +
conv — whole-stage codegen, no UDF, no shuffle, no driver state);
stratified rates add ONE tiny aggregation to count strata plus a
broadcast of |strata| rows. A 10^12-row resample is a single map pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5-hex prefix length: 12 hex digits = 48 bits — plenty of resolution
# for rates down to 1e-9 while staying exactly representable in a double
_HEX_DIGITS = 12
_DENOM = float(16 ** _HEX_DIGITS)


def hash_unit(id_col, seed: int = 0):
    """Column expr: deterministic uniform [0, 1) from the row id —
    md5(id || ':' || seed) first 12 hex digits / 16^12. Engine-portable
    (the DuckDB twin is the same expression), partition-independent, and
    monotone-threshold-stable (bigger rate ⊃ smaller rate, same seed)."""
    h = F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("double") / F.lit(
        _DENOM
    )


def sample_rate(
    df: DataFrame, rate: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on the row id."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.filter(hash_unit(F.col(id_col), seed) < float(rate))


def sample_stratified(
    df: DataFrame,
    rates: dict,
    by: str,
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps a ``by`` value →
    keep rate (strata absent from the map get ``default_rate``). One
    stateless filter pass; the rate table rides along as a broadcast-sized
    CASE expression."""
    for v in rates.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError("rates must be in [0, 1]")
    rate_col = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate_col = F.when(F.col(by) == key, float(r)).otherwise(rate_col)
    return df.filter(hash_unit(F.col(id_col), seed) < rate_col)


def rates_for_targets(
    df: DataFrame, targets: dict, by: str, total: int
) -> dict:
    """Solve per-stratum rates for a target MIX: ``targets`` maps stratum →
    desired proportion of a ``total``-row sample. rate = target·total /
    |stratum|, capped at 1.0 (an under-populated stratum contributes all
    it has — the standard up-capping; callers can renormalize if the cap
    binds). ONE count aggregation over the corpus; the result is a
    driver-side dict of |strata| floats."""
    counts = {
        r[by]: r["n"]
        for r in df.groupBy(by).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[by] in targets
    }
    return {
        k: min(1.0, targets[k] * float(total) / counts[k])
        for k in targets
        if counts.get(k)
    }


def targets_for_temperature(
    df: DataFrame, by: str, alpha: float = 0.3
) -> dict:
    """Temperature-based mixture proportions (the multilingual-LM mixing
    rule: p_i ∝ n_i^alpha, alpha<1 up-weights low-resource strata —
    alpha=0.3 is the mBERT/XLM-R setting, alpha=1 is natural frequency,
    alpha=0 is uniform). Returns stratum → target proportion summing to
    1.0; feed into ``rates_for_targets`` to get concrete sampling rates:

        targets = targets_for_temperature(df, "lang", alpha=0.3)
        rates = rates_for_targets(df, targets, "lang", total=10_000_000)

    ONE count aggregation; the result is a driver-side dict of |strata|
    floats."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = {
        r[by]: r["n"]
        for r in df.groupBy(by).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[by] is not None and r["n"] > 0
    }
    weights = {k: float(n) ** alpha for k, n in counts.items()}
    z = sum(weights.values())
    return {k: w / z for k, w in weights.items()}


def _hash_unit_sql(id_col: str, seed: int = 0) -> str:
    """DuckDB twin of ``hash_unit`` as an expression string."""
    return (
        f"CAST(('0x' || substring(md5(CAST({id_col} AS VARCHAR) || ':{seed}'), "
        f"1, {_HEX_DIGITS})) AS UBIGINT) / {_DENOM!r}"
    )


def sample_rate_sql(
    table: str,
    rate: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB twin of ``sample_rate`` — same md5 prefix arithmetic, so the
    selected set is IDENTICAL, not statistically similar."""
    return f"""
SELECT * FROM {table}
WHERE {_hash_unit_sql(id_col, seed)} < {float(rate)!r}
"""


def shuffle_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` balanced shards with
    a reproducible within-shard order — the "shuffle the corpus ONCE,
    write ordered shards" step in front of training (data loaders then
    stream shards sequentially; example order must not depend on how the
    prep job happened to be partitioned).

    Why not ``orderBy(rand(seed))``: Spark seeds rand per PARTITION, so
    the permutation changes with input splits, AQE re-plans, and task
    retries. Here both coordinates are pure functions of the row id:
    h = md5(id‖seed); shard = int(h[:12], 16) mod n_shards; pos = rank of
    h within the shard (full 32-hex ordering, id tie-break). Same
    permutation at any parallelism, on any engine (SQL twin), and
    re-runs are idempotent.

    Scale shape: one shuffle (the per-shard rank window, keyed on shard —
    ~|rows|/n_shards per window partition; pick n_shards ≥ executor count
    at 100 TB so no window partition outgrows an executor). To persist:
    ``out.repartition("shard").sortWithinPartitions("pos")
    .write.partitionBy("shard")`` — readers get ordered files per shard.

    Output: input columns + (shard int, pos long), pos 1-based dense
    within each shard."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
    out = df.withColumn("_h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("_h"), 1, _HEX_DIGITS), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("_h")


def shuffle_shards_sql(
    table: str, n_shards: int, id_col: str = "doc_id", seed: int = 0
) -> str:
    """DuckDB twin of ``shuffle_shards`` — identical md5 coordinates, so
    shard assignment AND within-shard order match row for row."""
    h = f"md5(CAST({id_col} AS VARCHAR) || ':{seed}')"
    shard = (
        f"(CAST(('0x' || substring({h}, 1, {_HEX_DIGITS})) AS BIGINT) % {n_shards})"
    )
    return f"""
SELECT * EXCLUDE (_h),
       row_number() OVER (PARTITION BY shard ORDER BY _h, {id_col})::BIGINT AS pos
FROM (SELECT *, {h} AS _h, {shard}::INT AS shard FROM {table})
"""


def split_by_group(
    df: DataFrame,
    by: str,
    fractions: dict | None = None,
    seed: int = 0,
) -> DataFrame:
    """Leakage-safe train/valid/test assignment: the split is a pure
    function of the GROUP key (e.g. ``repo``), so every row of a group —
    every file of a repository, every page of a site — lands in the same
    split. Splitting on the row id instead leaks near-duplicate rows
    across splits (same repo, trivially different files), which inflates
    eval scores; group-keyed hashing is the standard fix.

    ``fractions`` maps split name → fraction (must sum to 1.0 within
    1e-9; default 0.8/0.1/0.1 train/valid/test). Assignment: u =
    md5(group‖seed) ∈ [0,1) against cumulative thresholds in SORTED split-
    name order (pinned — dict order must not matter). Stateless codegen
    CASE expression, zero shuffle, identical at any parallelism; the
    DuckDB twin reproduces the exact assignment.
    """
    fractions = dict(fractions or {"test": 0.1, "train": 0.8, "valid": 0.1})
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    u = hash_unit(F.col(by), seed)
    expr = None
    cum = 0.0
    items = sorted(fractions.items())
    for name, frac in items[:-1]:
        cum += float(frac)
        expr = (
            F.when(u < cum, name) if expr is None else expr.when(u < cum, name)
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_by_group_sql(
    table: str, by: str, fractions: dict | None = None, seed: int = 0
) -> str:
    """DuckDB twin of ``split_by_group`` (same md5 thresholds)."""
    fractions = dict(fractions or {"test": 0.1, "train": 0.8, "valid": 0.1})
    u = _hash_unit_sql(by, seed)
    items = sorted(fractions.items())
    case = "CASE"
    cum = 0.0
    for name, frac in items[:-1]:
        cum += float(frac)
        case += f" WHEN {u} < {cum!r} THEN '{name}'"
    case += f" ELSE '{items[-1][0]}' END"
    return f"SELECT *, {case} AS split FROM {table}"


def resample_rate(
    df: DataFrame, rate: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic resampling WITH replacement — the epoch repeat factor
    of data-mixing recipes (a 2.3× language appears ⌊2.3⌋ = 2 times, plus
    once more for 30% of its rows). Each row yields
    ``⌊rate⌋ + [u < frac(rate)]`` copies, with u the SAME md5 unit hash
    ``sample_rate`` uses — so rate ≤ 1 degrades to exactly its Bernoulli
    subset, and the monotone-threshold property extends: the copy set at
    rate r is a sub-multiset of the copy set at r' > r (same seed).

    Output = input columns + ``copy`` (0-based repeat index) so a
    downstream shuffle can decorrelate repeats. Stateless narrow transform
    (sequence + explode), no shuffle."""
    if rate < 0.0:
        raise ValueError("rate must be ≥ 0")
    n_base = int(rate)
    frac = float(rate) - n_base
    n_copies = F.lit(n_base) + (hash_unit(F.col(id_col), seed) < frac).cast("int")
    return (
        df.withColumn("_nc", n_copies)
        .filter(F.col("_nc") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .drop("_nc")
    )


def resample_stratified(
    df: DataFrame,
    rates: dict,
    by: str,
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum ``resample_rate``: rates may exceed 1 (upsample) or sit
    below 1 (downsample) per ``by`` value — one pass implements an entire
    mixture recipe. Strata absent from the map keep ``default_rate``
    (1.0 = pass through once)."""
    for v in rates.values():
        if v < 0.0:
            raise ValueError("rates must be ≥ 0")
    if default_rate < 0.0:
        raise ValueError("default_rate must be ≥ 0")
    rate_col = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate_col = F.when(F.col(by) == key, float(r)).otherwise(rate_col)
    u = hash_unit(F.col(id_col), seed)
    n_copies = F.floor(rate_col).cast("int") + (
        u < (rate_col - F.floor(rate_col))
    ).cast("int")
    return (
        df.withColumn("_nc", n_copies)
        .filter(F.col("_nc") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .drop("_nc")
    )


def _rate_case_sql(rates: dict, by: str, default_rate: float) -> str:
    branches = " ".join(
        f"WHEN {by} = '{k}' THEN {float(r)!r}" for k, r in sorted(rates.items())
    )
    return f"(CASE {branches} ELSE {float(default_rate)!r} END)"


def resample_stratified_sql(
    table: str,
    rates: dict,
    by: str,
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 1.0,
) -> str:
    """DuckDB twin of ``resample_stratified`` — identical hash, floor, and
    copy expansion, so the output MULTISET matches row for row."""
    rc = _rate_case_sql(rates, by, default_rate)
    u = _hash_unit_sql(id_col, seed)
    nc = f"(floor({rc})::INT + CASE WHEN ({u}) < ({rc} - floor({rc})) THEN 1 ELSE 0 END)"
    return f"""
SELECT t.* , unnest(range({nc}))::INT AS copy
FROM {table} t
WHERE {nc} > 0
"""
