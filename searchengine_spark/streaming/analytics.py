"""Windowed event analytics: tumbling/sliding time-window aggregation that
runs UNCHANGED on a batch DataFrame and on a Structured Stream — the Spark
unified-API contract the engine's search-analytics surface builds on
(query-log volumes, error rates, trending event types).

Reference parity note: the reference has no event/analytics surface; this
covers the driver brief's Structured Streaming requirements (watermarks +
windowed aggs for late data) over the provided ``events`` table
(event_id, ts, user_id, event_type, value, props).

Scale shape: ONE hash aggregation keyed (window, event_type) with map-side
partial combine — cardinality is |windows| × |types|, tiny next to the
event stream, so the shuffle moves partial rows only. Streaming state is
the same keyed store; the watermark bounds it (windows older than
``delay`` are finalized and evicted — without it, state grows with stream
lifetime and a 10^12-event stream OOMs the store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROUND_DP = 6


def windowed_event_counts(
    df: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """→ (window_start, window_end, event_type, n_events, sum_value):
    tumbling (default) or sliding (``slide`` < ``window``) counts + value
    sums per event type. Works identically on a batch frame and a
    streaming frame (pass the result to ``writeStream`` with a watermark
    set upstream — see ``stream_windowed_event_counts``)."""
    w = F.window(F.col(ts_col), window, slide or window)
    return (
        df.groupBy(w.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), ROUND_DP).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_sql(
    table: str,
    window_seconds: int,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB twin (tumbling only): epoch-floor bucketing reproduces
    ``F.window`` exactly for windows that divide a day."""
    # floor() before the cast: epoch() returns fractional seconds and a
    # plain ::BIGINT cast ROUNDS, pushing rows in the last half-second of
    # a window into the next bucket
    b = (
        f"to_timestamp((floor(epoch({ts_col}) / {window_seconds})::BIGINT) "
        f"* {window_seconds})::TIMESTAMP"
    )
    return f"""
SELECT {b} AS window_start,
       {b} + INTERVAL {window_seconds} SECOND AS window_end,
       {type_col} AS event_type,
       count(*)::BIGINT AS n_events,
       round(sum({value_col}), {ROUND_DP}) AS sum_value
FROM {table}
GROUP BY 1, 2, 3
"""


def stream_windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    schema: str = "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string",
    output_mode: str = "update",
    query_name: str = "event_windows",
):
    """Streaming twin: parquet-file source → watermark → the SAME
    ``windowed_event_counts`` transformation → in-memory sink (swap for a
    real sink in production). Returns the StreamingQuery.

    The watermark finalizes a window once event time passes
    window_end + ``watermark``: later-arriving rows for it are DROPPED
    (the late-data contract) and its state is evicted — the property that
    bounds state on an unbounded stream. ``output_mode='update'`` emits
    refined rows per batch; 'append' emits each window exactly once, only
    after finalization."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    agg = windowed_event_counts(stream, window, slide)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization (``F.session_window``): consecutive events
    of one key belong to one session while each arrives at or before the
    previous event's time + gap (an event landing EXACTLY on the boundary
    still merges — pytest-pinned); the session window is
    [first_ts, last_ts + gap). → (key, session_start, session_end,
    n_events, sum_value). Batch and streaming take the same code path
    (streaming side needs a watermark upstream, like the fixed windows).

    Scale shape: one shuffle keyed on the session key; Spark merges
    per-key sorted runs inside the aggregation — no self-join, no
    corpus-wide window function."""
    w = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        df.groupBy(F.col(key_col), w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), ROUND_DP).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def sessionize_sql(
    table: str,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> str:
    """DuckDB twin of ``sessionize`` — the classic gaps-and-islands
    rewrite: a break flag where the gap to the previous event is > gap
    (session_window merges an exact-boundary arrival — pinned by
    tests/test_event_analytics.py), a
    running sum of breaks as the session id, then one group-by. Session
    end = last event + gap, same as Spark."""
    return f"""
WITH o AS (
  SELECT {key_col}, {ts_col}, {value_col},
         CASE WHEN lag({ts_col}) OVER w IS NULL
                OR {ts_col} - lag({ts_col}) OVER w > INTERVAL {gap_seconds} SECOND
              THEN 1 ELSE 0 END AS brk
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col})),
i AS (
  SELECT *, sum(brk) OVER (PARTITION BY {key_col} ORDER BY {ts_col}
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM o)
SELECT {key_col},
       min({ts_col}) AS session_start,
       max({ts_col}) + INTERVAL {gap_seconds} SECOND AS session_end,
       count(*)::BIGINT AS n_events,
       round(sum({value_col}), {ROUND_DP}) AS sum_value
FROM i GROUP BY {key_col}, sess
"""


def top_types_per_window(
    df: DataFrame,
    window: str = "1 hour",
    n: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Trending: the ``n`` most frequent event types per tumbling window
    (count desc, type asc tie-break) — windowed counts then a rank window
    PARTITIONED by the time window (parallel across windows; never a
    global sort)."""
    from pyspark.sql import Window as W

    counts = windowed_event_counts(df, window, None, ts_col, type_col, value_col)
    w = W.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("window_start", "window_end", "rank", "event_type", "n_events")
    )


def top_types_per_window_sql(
    table: str,
    window_seconds: int,
    n: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB twin of ``top_types_per_window``."""
    inner = windowed_event_counts_sql(
        table, window_seconds, ts_col, type_col, value_col
    )
    return f"""
WITH counts AS ({inner}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY window_start
            ORDER BY n_events DESC, event_type ASC) AS rank
  FROM counts)
SELECT window_start, window_end, rank::INT AS rank, event_type, n_events
FROM ranked WHERE rank <= {n}
"""


def funnel(
    df: DataFrame,
    steps: list[str],
    horizon_seconds: int | None = None,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: → (step, step_no, n_users) where a user
    reaches step i by performing steps[0..i] in order — each step at the
    EARLIEST qualifying time, strictly after the previous step's time
    (same-timestamp events don't chain), and, with ``horizon_seconds``,
    within that horizon of the user's step-0 time (the classic
    'converted within an hour' cut).

    Scale shape: one keyed equi-join per step (k-1 joins for a k-step
    funnel), each joining the per-user frontier (ONE row per user) against
    that step's events — never a cross join; per-user event volume drives
    skew. Greedy earliest-qualifying chaining from the FIRST step-0 event
    is the first-touch funnel (Amplitude's 'first touch' mode): for steps
    AFTER the anchor, taking the earliest qualifying event never hurts,
    but the step-0 anchor itself is pinned — a user whose first A→…
    sequence misses the horizon is NOT retried from a later A (a
    re-anchoring 'any-touch' funnel would count them; that variant needs
    a per-anchor pass and is not offered here)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from pyspark import StorageLevel

    lvl = StorageLevel.MEMORY_AND_DISK
    # persist the filtered stream and each round's frontier: every step's
    # count is an action, and without caching step i would re-execute
    # joins 1..i (k(k+1)/2 event scans instead of the advertised k-1)
    ev = df.select(
        F.col(key_col).alias("k"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    ).persist(lvl)
    frontier = (
        ev.filter(F.col("t") == steps[0])
        .groupBy("k")
        .agg(F.min("ts").alias("ts"))
        .persist(lvl)
    )
    counts = [(steps[0], 0, frontier.count())]
    t0 = frontier.select("k", F.col("ts").alias("t0"))
    for i, step in enumerate(steps[1:], 1):
        nxt = ev.filter(F.col("t") == step).select(
            "k", F.col("ts").alias("ts_next")
        )
        cand = frontier.join(nxt, "k").filter(F.col("ts_next") > F.col("ts"))
        if horizon_seconds is not None:
            cand = cand.join(t0, "k").filter(
                F.col("ts_next")
                <= F.col("t0") + F.expr(f"INTERVAL {horizon_seconds} SECOND")
            )
        prev = frontier
        frontier = cand.groupBy("k").agg(F.min("ts_next").alias("ts")).persist(lvl)
        counts.append((step, i, frontier.count()))
        prev.unpersist()
    frontier.unpersist()
    ev.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(counts, "step string, step_no int, n_users long")


def funnel_sql(
    table: str,
    steps: list[str],
    horizon_seconds: int | None = None,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of ``funnel`` — the same greedy frontier as chained
    CTEs."""
    ctes = [
        f"f0 AS (SELECT {key_col} AS k, min({ts_col}) AS ts FROM {table} "
        f"WHERE {type_col} = '{steps[0]}' GROUP BY 1)",
        "t0 AS (SELECT k, ts AS t0 FROM f0)",
    ]
    for i, step in enumerate(steps[1:], 1):
        horizon = (
            f" AND e.{ts_col} <= t0.t0 + INTERVAL {horizon_seconds} SECOND"
            if horizon_seconds is not None
            else ""
        )
        ctes.append(
            f"f{i} AS (SELECT f.k, min(e.{ts_col}) AS ts "
            f"FROM f{i - 1} f JOIN {table} e ON e.{key_col} = f.k "
            f"AND e.{type_col} = '{step}' AND e.{ts_col} > f.ts "
            f"JOIN t0 ON t0.k = f.k{horizon} GROUP BY 1)"
        )
    selects = " UNION ALL ".join(
        f"SELECT '{s}' AS step, {i} AS step_no, "
        f"(SELECT count(*) FROM f{i})::BIGINT AS n_users"
        for i, s in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def retention_cohorts(
    df: DataFrame,
    period_seconds: int = 86_400,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Cohort retention matrix: → (cohort, period_no, n_users) where
    ``cohort`` is the user's first-event period (epoch-floor buckets of
    ``period_seconds``) and a user counts in ``period_no`` = k if they
    were active k periods after their cohort period (period 0 = the
    cohort itself, so its n_users is the cohort size).

    Scale shape: one min-agg for first-seen (map-side combined), one
    distinct over (user, period) — activity collapses to at most
    |users|·|periods| rows before the count — then one count agg. No
    joins against the raw stream beyond the broadcast-sized first-seen
    side."""
    p = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        / (period_seconds * 1_000_000)
    ).cast("long")
    ev = df.select(F.col(key_col).alias("k"), p.alias("p"))
    first = ev.groupBy("k").agg(F.min("p").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(first, "k")
        .groupBy("cohort", (F.col("p") - F.col("cohort")).alias("period_no"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def retention_cohorts_sql(
    table: str,
    period_seconds: int = 86_400,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> str:
    """DuckDB twin of ``retention_cohorts``."""
    p = f"floor(epoch({ts_col}) / {period_seconds})::BIGINT"
    return f"""
WITH ev AS (SELECT {key_col} AS k, {p} AS p FROM {table}),
first AS (SELECT k, min(p) AS cohort FROM ev GROUP BY 1),
active AS (SELECT DISTINCT k, p FROM ev)
SELECT f.cohort, (a.p - f.cohort)::BIGINT AS period_no,
       count(*)::BIGINT AS n_users
FROM active a JOIN first f USING (k)
GROUP BY 1, 2
"""
