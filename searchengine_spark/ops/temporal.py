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
    semantics). Right-side ties on (key, ts) resolve to the row ordered
    last — pass a unique column in ``right_cols`` to make the pick
    auditable."""
    carry = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_src"), carry.alias("_carry")
    )
    l = left.withColumn("_src", F.lit(1)).withColumn(
        "_carry", F.lit(None).cast(r.schema["_carry"].dataType)
    )
    # strict: a right row at ts == left.ts must NOT match -> order it after
    # the left row so last() cannot see it
    src_order = F.col("_src") if not strict else -F.col("_src")
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), src_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_carry", ignorenulls=True).over(w)
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(matched["ts"].alias(f"{prefix}{ts_col}"))
    out_cols.extend(matched[c].alias(f"{prefix}{c}") for c in right_cols)
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
