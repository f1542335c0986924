"""Temporal joins Spark lacks as built-ins, composed from one keyed
window pass (the driver brief's canonical custom-operator example).

As-of join: each left row picks the LATEST right row of the same key
with right.ts <= left.ts (market-data "last quote before the trade",
analytics "most recent view before the click", feature-store
point-in-time correctness).

Scale shape: the naive formulation is an inequality join (quadratic
blow-up, BroadcastNestedLoop at best). Instead: UNION the two sides
tagged by source, ONE shuffle keyed on the join key, and a running
``last(right_payload, ignorenulls)`` over (ts, source) — linear, sorted
within partitions only, no self-join. Skew follows per-key event volume
(salt the key upstream if one user owns the stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "matched_",
    strict: bool = False,
) -> DataFrame:
    """→ every ``left`` row + ``prefix``-named columns of the latest
    ``right`` row with right.ts <= left.ts (``strict=True``: < left.ts)
    per ``on`` key; nulls where no prior right row exists (left-join
    semantics). Right-side ties on (key, ts) resolve DETERMINISTICALLY to
    the greatest (ts, *right_cols) payload struct — include a unique
    column in ``right_cols`` to pin and audit the pick."""
    carry = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c) for c in right_cols]
    )
    # a NULL join key matches NOTHING (the DuckDB ASOF twin's equality
    # predicate never matches NULLs; the window would group all NULL keys
    # into one partition and match them to each other) — dropping NULL-key
    # RIGHT rows makes NULL-key left rows come back unmatched, the twin's
    # exact behavior
    r = right.filter(F.col(on).isNotNull()).select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_src"), carry.alias("_carry")
    )
    l = left.withColumn("_src", F.lit(1)).withColumn(
        "_carry", F.lit(None).cast(r.schema["_carry"].dataType)
    )
    # strict: a right row at ts == left.ts must NOT match -> order it after
    # the left row so last() cannot see it
    src_order = F.col("_src") if not strict else -F.col("_src")
    # trailing _carry: right rows tied on (key, ts) sort by payload struct,
    # so last() picks the greatest deterministically (left rows carry null,
    # which sorts first within their group — harmless)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), src_order, F.col("_carry"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_carry", ignorenulls=True).over(w)
    return (
        l.select(*r.columns, *[c for c in left.columns if c not in r.columns])
        .unionByName(
            r.select(
                *r.columns,
                *[
                    F.lit(None).cast(l.schema[c].dataType).alias(c)
                    for c in left.columns
                    if c not in r.columns
                ],
            )
        )
        .withColumn("_m", matched)
        .filter(F.col("_src") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col("_m")["ts"].alias(f"{prefix}{ts_col}"),
            *[F.col("_m")[c].alias(f"{prefix}{c}") for c in right_cols],
        )
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "matched_",
    strict: bool = False,
) -> str:
    """DuckDB twin — the native ASOF LEFT JOIN."""
    op = "<" if strict else "<="
    rcols = ", ".join(
        f"r.{c} AS {prefix}{c}" for c in (ts_col, *right_cols)
    )
    return f"""
SELECT l.*, {rcols}
FROM ({left_sql}) l
ASOF LEFT JOIN ({right_sql}) r
  ON l.{on} = r.{on} AND r.{ts_col} {op} l.{ts_col}
"""


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: every ``points`` row matched to the
    ``intervals`` rows (same ``keys``) whose half-open [start, end)
    contains its timestamp.

    Scale shape: the naive formulation is an inequality join — Spark
    plans BroadcastNestedLoop (quadratic work, driver-sized broadcast).
    Instead both sides BUCKETIZE on fixed ``bucket``-wide time cells:
    intervals explode to the cells they cover, points map to their one
    cell, and the match becomes an EQUI-join on (keys, cell) + a cheap
    residual range filter — the standard range-join optimization. A point
    meets an interval in exactly the point's own cell, so no dedup pass
    is needed. Pick ``bucket`` near the typical interval length: cells
    per interval ≈ length/bucket (explode factor), points per cell ≈
    rate·bucket (join fan-in). NTZ timestamps are bucketed as their
    session-timezone instant (cast before unix_micros). Inner join only — a residual range filter
    after an outer join silently drops the null-extension rows, so outer
    flavors need the filter inside the join condition (not offered here).
    Timestamps must be post-epoch (integer ``div`` truncates toward
    zero)."""
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    bucket_us = _interval_micros(points.sparkSession, bucket)
    # integer `div`, not float `/`: a double quotient can land just below
    # an exact multiple and floor into the previous cell
    p = points.withColumn(
        "_cell", F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {bucket_us}")
    )
    # guard BEFORE the explode: sequence(a, b) with a > b counts DOWN, so
    # one inverted interval (end < start — corrupt row) would fan out into
    # an unbounded descending cell list; empty [t, t) intervals match
    # nothing either way and are dropped with them
    i = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(cast({start_col} as timestamp)) div {bucket_us}"),
                F.expr(f"(unix_micros(cast({end_col} as timestamp)) - 1) div {bucket_us}"),
            )
        ),
    )
    cond = [p["_cell"] == i["_cell"]] + [p[k] == i[k] for k in keys]
    joined = p.join(i, cond, "inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    out = joined.drop(p["_cell"]).drop(i["_cell"])
    for k in keys:
        out = out.drop(i[k])
    return out


def _interval_micros(spark, interval: str) -> int:
    row = spark.sql(
        f"SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:00Z' + INTERVAL {interval}) AS us"
    ).collect()[0]
    return int(row["us"])


def range_join_sql(
    points_sql: str,
    intervals_sql: str,
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
) -> str:
    """DuckDB twin — the plain inequality join (DuckDB's IEJoin handles
    it natively at oracle scale)."""
    on = " AND ".join(
        [f"p.{k} = i.{k}" for k in keys]
        + [f"p.{ts_col} >= i.{start_col}", f"p.{ts_col} < i.{end_col}"]
    )
    icols = f"i.* EXCLUDE ({', '.join(keys)})" if keys else "i.*"
    return f"""
SELECT p.*, {icols}
FROM ({points_sql}) p
JOIN ({intervals_sql}) i ON {on}
"""
