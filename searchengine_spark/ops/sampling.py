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
    monotone-threshold-stable (bigger rate ⊃ smaller rate, same seed).
    A NULL id hashes as the empty string on BOTH engines (coalesce here,
    coalesce in the twin) — concat_ws alone would skip the null AND its
    separator while DuckDB's || propagates NULL, silently sampling
    different sets across engines."""
    h = F.md5(
        F.concat_ws(
            ":", F.coalesce(id_col.cast("string"), F.lit("")), F.lit(str(seed))
        )
    )
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
    for v in list(rates.values()) + [default_rate]:
        if not 0.0 <= v <= 1.0:
            raise ValueError("rates (and default_rate) must be in [0, 1]")
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
        f"CAST(('0x' || substring(md5(COALESCE(CAST({id_col} AS VARCHAR), '')"
        f" || ':{seed}'), 1, {_HEX_DIGITS})) AS UBIGINT) / {_DENOM!r}"
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


# ---------------------------------------------------------------------------
# Token-budget mixture planning (the LLaMA/DoReMi "data recipe" step):
# given target mixture WEIGHTS over sources, a total token BUDGET, and a
# repetition cap (max epochs per source), solve per-source token
# allocations by waterfilling — a source whose capacity (tokens ×
# max_epochs) can't fill its proportional share saturates, and its
# shortfall is redistributed to the remaining sources in weight
# proportion. Closed form: sort sources by capacity/weight ascending; the
# saturated set is a prefix of that order, found with two window cumsums —
# fully relational, no driver loop, O(|sources|) state. The token count is
# ONE map-side-combined aggregation over the corpus; at 10^12 rows that
# scan dominates and the plan itself is free.
# ---------------------------------------------------------------------------


def _ws_tokens(text_col: str):
    # ONE whitespace-token-count definition repo-wide (textstats owns it)
    from .textstats import _ws_tokens_expr

    return _ws_tokens_expr(text_col)


def mixture_plan(
    df: DataFrame,
    budget_tokens: float,
    weights: dict,
    max_epochs: float = 1.0,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, tokens_avail, weight, alloc_tokens, epochs, share): the
    waterfilled data recipe. ``epochs`` is the repetition factor the
    trainer should apply (≤ max_epochs); ``share`` is alloc/budget.
    Σ alloc = min(budget, Σ capacity) exactly."""
    from pyspark.sql import Window

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be > 0")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")
    if not weights or any(v <= 0 for v in weights.values()):
        raise ValueError("weights must be a non-empty dict of positives")
    z = float(sum(weights.values()))
    norm = {k: float(v) / z for k, v in sorted(weights.items())}
    b = float(budget_tokens)

    w_col = F.lit(None).cast("double")
    for key, w in norm.items():
        w_col = F.when(F.col(by) == key, F.lit(w)).otherwise(w_col)

    counts = (
        df.filter(F.col(by).isin(*norm))
        .groupBy(F.col(by).alias("source"))
        .agg(F.sum(_ws_tokens(text_col)).cast("long").alias("tokens_avail"))
    )
    # renormalize over the PRESENT sources (the py twin's `k in tokens`
    # rule): with a weighted source absent from df, weights no longer sum
    # to 1 and the closed-form denominators would under-allocate the
    # budget — Σ alloc must stay min(budget, Σ capacity)
    wall = Window.partitionBy()
    base = (
        counts.select(
            "source",
            "tokens_avail",
            w_col.alias("w0"),
            (
                F.col("tokens_avail").cast("double") * F.lit(float(max_epochs))
            ).alias("capacity"),
        )
        .withColumn("weight", F.col("w0") / F.sum("w0").over(wall))
        .drop("w0")
        .withColumn("ratio", F.col("capacity") / F.col("weight"))
    )

    ordw = (
        Window.orderBy("ratio", "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.select(
        "*",
        F.sum("capacity").over(ordw).alias("cum_c"),
        F.sum("weight").over(ordw).alias("cum_w"),
    )
    sat = cum.withColumn(
        "saturated",
        F.col("ratio")
        <= (F.lit(b) - (F.col("cum_c") - F.col("capacity")))
        / (F.lit(1.0) - (F.col("cum_w") - F.col("weight"))),
    )
    full = (
        Window.orderBy("ratio", "source")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lev = sat.select(
        "*",
        F.max(F.when(F.col("saturated"), F.col("cum_c")).otherwise(0.0))
        .over(full)
        .alias("sat_c"),
        F.max(F.when(F.col("saturated"), F.col("cum_w")).otherwise(0.0))
        .over(full)
        .alias("sat_w"),
    )
    alloc = F.when(F.col("saturated"), F.col("capacity")).otherwise(
        F.col("weight")
        * (F.lit(b) - F.col("sat_c"))
        / (F.lit(1.0) - F.col("sat_w"))
    )
    # zero-token source: capacity 0 ⇒ alloc 0, and 0/0 is an ANSI
    # DIVIDE_BY_ZERO crash (NULL in the DuckDB twin) — its epoch count is 0
    epochs = F.when(
        F.col("tokens_avail") > 0, alloc / F.col("tokens_avail")
    ).otherwise(F.lit(0.0))
    return lev.select(
        "source",
        "tokens_avail",
        F.round("weight", 5).alias("weight"),
        F.round(alloc, 5).alias("alloc_tokens"),
        F.round(epochs, 5).alias("epochs"),
        F.round(alloc / F.lit(b), 5).alias("share"),
    )


def mixture_apply(
    df: DataFrame,
    budget_tokens: float,
    weights: dict,
    max_epochs: float = 1.0,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Materialize the data recipe: solve ``mixture_plan`` (a |sources|-row
    plan, collected to the driver) and expand the corpus with
    ``resample_stratified`` at each source's planned epoch rate — a source
    at 1.8 epochs emits every doc once plus a deterministic 80% hash-subset
    a second time; sources outside the plan are dropped (rate 0). Output =
    input columns + ``copy``.

    Token-level note: the realized token count per source is the epoch
    rate × tokens_avail in expectation only — the fractional epoch selects
    docs by the id hash, not by length. That is the standard trainer
    behaviour (repeat factors apply to documents); exact-token trimming
    belongs to the sequence packer downstream.

    Scale shape: the plan is one map-side-combined aggregation + |sources|
    rows on the driver; the expansion is the same stateless narrow
    explode as ``resample_stratified``. No join, no shuffle. Epoch rates
    are rounded to 5 dp before thresholding so the multiset is engine-
    portable (the SQL twin rounds identically)."""
    plan = mixture_plan(
        df, budget_tokens, weights, max_epochs=max_epochs, by=by,
        text_col=text_col,
    ).collect()
    rates = {r["source"]: float(r["epochs"]) for r in plan}
    return resample_stratified(
        df, rates, by=by, id_col=id_col, seed=seed, default_rate=0.0
    )


def mixture_apply_sql(
    table: str,
    budget_tokens: float,
    weights: dict,
    max_epochs: float = 1.0,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB twin of ``mixture_apply``: the plan CTE (identical to
    ``mixture_plan_sql``) joined back to the table, same 5-dp-rounded
    epoch rate, same md5 copy expansion — the output multiset matches row
    for row."""
    plan = mixture_plan_sql(
        table, budget_tokens, weights, max_epochs=max_epochs, by=by,
        text_col=text_col,
    )
    u = _hash_unit_sql(f"t.{id_col}", seed)
    nc = (
        "(floor(p.epochs)::INT + CASE WHEN "
        f"({u}) < (p.epochs - floor(p.epochs)) THEN 1 ELSE 0 END)"
    )
    return f"""
WITH plan AS ({plan})
SELECT t.*, unnest(range({nc}))::INT AS copy
FROM {table} t JOIN plan p ON t.{by} = p.source
WHERE {nc} > 0
"""


def mixture_plan_py(
    tokens: dict, budget_tokens: float, weights: dict, max_epochs: float = 1.0
) -> dict:
    """Pure-Python iterative waterfilling (test twin): repeatedly saturate
    any source whose proportional share exceeds capacity, renormalize the
    rest. Returns source → alloc tokens."""
    z = float(sum(weights.values()))
    norm = {k: float(v) / z for k, v in weights.items() if k in tokens}
    cap = {k: tokens[k] * float(max_epochs) for k in norm}
    alloc, remaining, rem_b = {}, dict(norm), float(budget_tokens)
    while remaining:
        zz = sum(remaining.values())
        over = {
            k for k in remaining if cap[k] < remaining[k] / zz * rem_b
        }
        if not over:
            for k in remaining:
                alloc[k] = remaining[k] / zz * rem_b
            break
        for k in over:
            alloc[k] = cap[k]
            rem_b -= cap[k]
            del remaining[k]
    return alloc


def mixture_plan_sql(
    table: str,
    budget_tokens: float,
    weights: dict,
    max_epochs: float = 1.0,
    by: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin — identical normalization (done here in Python and
    embedded as literals, so no cross-engine float-sum drift), identical
    window shapes."""
    z = float(sum(weights.values()))
    norm = {k: float(v) / z for k, v in sorted(weights.items())}
    b = float(budget_tokens)
    keys = ", ".join(f"'{k}'" for k in norm)
    w_case = "CASE " + " ".join(
        f"WHEN {by} = '{k}' THEN {w!r}::DOUBLE" for k, w in norm.items()
    ) + " END"
    toks = (
        f"CASE WHEN trim({text_col}) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim({text_col}), '\\s+')) END"
    )
    return f"""
WITH t AS (
  SELECT {by} AS source, CAST(sum({toks}) AS BIGINT) AS tokens_avail,
         {w_case} AS weight
  FROM {table} WHERE {by} IN ({keys}) GROUP BY {by}
), base AS (
  SELECT source, tokens_avail,
         weight / sum(weight) OVER () AS weight,
         tokens_avail::DOUBLE * {float(max_epochs)!r} AS capacity,
         tokens_avail::DOUBLE * {float(max_epochs)!r}
           / (weight / sum(weight) OVER ()) AS ratio
  FROM t
), cum AS (
  SELECT *,
         sum(capacity) OVER (ORDER BY ratio, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
         sum(weight) OVER (ORDER BY ratio, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
  FROM base
), sat AS (
  SELECT *, ratio <= ({b!r} - (cum_c - capacity))
                     / (1.0 - (cum_w - weight)) AS saturated
  FROM cum
), lev AS (
  SELECT *,
         max(CASE WHEN saturated THEN cum_c ELSE 0.0 END) OVER () AS sat_c,
         max(CASE WHEN saturated THEN cum_w ELSE 0.0 END) OVER () AS sat_w
  FROM sat
)
SELECT source, tokens_avail, round(weight, 5) AS weight,
       round(CASE WHEN saturated THEN capacity
                  ELSE weight * ({b!r} - sat_c) / (1.0 - sat_w) END, 5)
         AS alloc_tokens,
       round(CASE WHEN tokens_avail = 0 THEN 0.0
                  WHEN saturated THEN capacity / tokens_avail
                  ELSE weight * ({b!r} - sat_c) / (1.0 - sat_w)
                       / tokens_avail END, 5) AS epochs,
       round(CASE WHEN saturated THEN capacity
                  ELSE weight * ({b!r} - sat_c) / (1.0 - sat_w) END
             / {b!r}, 5) AS share
FROM lev
"""
