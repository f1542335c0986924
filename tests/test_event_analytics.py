"""Windowed event analytics (streaming/analytics.py): batch/stream
identity under the unified API, watermark late-data semantics, and
sliding windows.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from searchengine_spark.streaming.analytics import (
    stream_windowed_event_counts,
    windowed_event_counts,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _row(i, minute, etype, value, second=0):
    return (
        i,
        dt.datetime(2024, 1, 1, minute // 60, minute % 60, second),
        i % 5,
        etype,
        float(value),
        "{}",
    )


ROWS = [
    _row(0, 1, "click", 1.0),
    _row(1, 2, "view", 2.5),
    _row(2, 9, "click", 0.5),
    _row(3, 11, "click", 4.0),
    _row(4, 14, "error", 1.25),
    _row(5, 59, "view", 3.0, second=59),  # last second of its window
    _row(6, 60, "view", 1.0),  # first second of the next hour window
]


def _key(rows):
    return sorted(
        (str(r["window_start"]), str(r["window_end"]), r["event_type"],
         r["n_events"], r["sum_value"])
        for r in rows
    )


def test_batch_windows_tumbling(spark):
    ev = spark.createDataFrame(ROWS, SCHEMA)
    got = _key(windowed_event_counts(ev, "10 minutes").collect())
    assert got == sorted([
        ("2024-01-01 00:00:00", "2024-01-01 00:10:00", "click", 2, 1.5),
        ("2024-01-01 00:00:00", "2024-01-01 00:10:00", "view", 1, 2.5),
        ("2024-01-01 00:10:00", "2024-01-01 00:20:00", "click", 1, 4.0),
        ("2024-01-01 00:10:00", "2024-01-01 00:20:00", "error", 1, 1.25),
        ("2024-01-01 00:50:00", "2024-01-01 01:00:00", "view", 1, 3.0),
        ("2024-01-01 01:00:00", "2024-01-01 01:10:00", "view", 1, 1.0),
    ])


def test_sliding_windows_count_every_overlap(spark):
    ev = spark.createDataFrame(ROWS[:1], SCHEMA)  # one event at 00:01
    got = _key(windowed_event_counts(ev, "10 minutes", "5 minutes").collect())
    # a 10-minute window sliding by 5 holds the event twice
    assert got == sorted([
        ("2023-12-31 23:55:00", "2024-01-01 00:05:00", "click", 1, 1.0),
        ("2024-01-01 00:00:00", "2024-01-01 00:10:00", "click", 1, 1.0),
    ])


def test_stream_equals_batch_and_drops_late_rows(spark, tmp_path):
    """Two micro-batches: batch 1 advances the watermark past the first
    window; batch 2 carries one on-time row and one LATE row for the
    already-finalized window — the late row must be dropped, everything
    else must equal the batch run over the surviving rows."""
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    batch1 = [_row(i, m, t, v) for i, m, t, v in
              [(0, 1, "click", 1.0), (1, 2, "view", 2.0), (2, 95, "click", 3.0)]]
    # watermark after batch1 = 01:35 - 10 min = 01:25 > window [0,10) end
    late = _row(10, 4, "click", 99.0)       # falls in finalized [00:00,00:10)
    ontime = _row(11, 96, "view", 5.0)      # current window, kept
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.mode(
        "append").parquet(src)
    q = stream_windowed_event_counts(
        spark, src, ckpt, window="10 minutes", watermark="10 minutes",
        output_mode="update", query_name="evt_test",
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame([late, ontime], SCHEMA).coalesce(1).write.mode(
            "append").parquet(src)
        q.processAllAvailable()
        got_rows = spark.sql("SELECT * FROM evt_test").collect()
    finally:
        q.stop()
    # update mode re-emits refined rows; keep the LAST emit per key
    final: dict[tuple, tuple] = {}
    for r in got_rows:
        final[(str(r["window_start"]), r["event_type"])] = (
            str(r["window_start"]), str(r["window_end"]), r["event_type"],
            r["n_events"], r["sum_value"],
        )
    survivors = batch1 + [ontime]  # late row dropped by the watermark
    want = _key(
        windowed_event_counts(
            spark.createDataFrame(survivors, SCHEMA), "10 minutes"
        ).collect()
    )
    assert sorted(final.values()) == want


def test_batch_matches_duckdb_twin(spark):
    import duckdb

    from searchengine_spark.streaming.analytics import windowed_event_counts_sql

    ev = spark.createDataFrame(ROWS, SCHEMA)
    got = _key(windowed_event_counts(ev, "600 seconds").collect())
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    want = sorted(
        (str(r[0]), str(r[1]), r[2], r[3], r[4])
        for r in con.execute(windowed_event_counts_sql("events", 600)).fetchall()
    )
    assert got == want


def test_sessionize_gap_boundary(spark):
    """An event arriving EXACTLY gap after the previous one still MERGES
    into the session (Spark extends while ts <= last + gap); the next gap
    is measured from the merged event."""
    import duckdb

    from searchengine_spark.streaming.analytics import sessionize, sessionize_sql

    rows = [
        _row(0, 0, "click", 1.0),
        _row(1, 9, "click", 1.0),    # 9 min later: same session (gap 10)
        _row(2, 19, "click", 1.0),   # exactly 10 min after prev: MERGES
        _row(3, 100, "view", 2.0),   # far later: third session
    ]
    # one user so sessions chain: user_id = i % 5 differs! pin user 0
    rows = [(i, ts, 0, t, v, p) for i, ts, _, t, v, p in rows]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in sessionize(ev, 600).collect()
    )
    assert got == [
        (0, "2024-01-01 00:00:00", "2024-01-01 00:29:00", 3),
        (0, "2024-01-01 01:40:00", "2024-01-01 01:50:00", 1),
    ]
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    want = sorted(
        (r[0], str(r[1]), str(r[2]), r[3])
        for r in con.execute(sessionize_sql("events", 600)).fetchall()
    )
    assert got == want


# ------------------------------------------------------------- as-of join
def test_asof_join_semantics(spark):
    """Tie at equal ts matches (non-strict) vs is skipped (strict); no
    prior right row -> nulls; latest of several candidates wins."""
    from searchengine_spark.ops.temporal import asof_join

    L = "event_id long, user_id long, ts timestamp"
    R = "user_id long, ts timestamp, value double"
    t = lambda m, s=0: dt.datetime(2024, 1, 1, 0, m, s)
    left = spark.createDataFrame(
        [(1, 7, t(10)), (2, 7, t(30)), (3, 8, t(5)), (4, 9, t(1))], L
    )
    right = spark.createDataFrame(
        [(7, t(2), 1.0), (7, t(10), 2.0), (7, t(29), 3.0), (8, t(6), 9.0)], R
    )
    got = {
        r["event_id"]: (r["matched_ts"], r["matched_value"])
        for r in asof_join(left, right).collect()
    }
    assert got[1] == (t(10), 2.0)      # equal ts matches
    assert got[2] == (t(29), 3.0)      # latest of three wins
    assert got[3] == (None, None)      # right row is later -> no match
    assert got[4] == (None, None)      # key has no right rows at all
    strict = {
        r["event_id"]: r["matched_value"]
        for r in asof_join(left, right, strict=True).collect()
    }
    assert strict[1] == 1.0            # equal ts excluded under strict


def test_asof_join_plan_has_no_inequality_join(spark):
    """The scale property: one keyed window over the union — no
    BroadcastNestedLoopJoin/CartesianProduct (what a naive ts-inequality
    join would plan)."""
    import contextlib
    import io

    from searchengine_spark.ops.temporal import asof_join

    L = "event_id long, user_id long, ts timestamp"
    R = "user_id long, ts timestamp, value double"
    left = spark.createDataFrame([], L)
    right = spark.createDataFrame([], R)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan and "Join" not in plan
    assert "Window" in plan


# ------------------------------------------------------------ range join
def test_range_join_boundaries_and_bucket_spans(spark):
    """Half-open [start, end): start included, end excluded; an interval
    spanning many cells matches a point in any of them exactly once; a
    point outside every interval drops (inner)."""
    from searchengine_spark.ops.temporal import range_join

    t = lambda m, s=0: dt.datetime(2024, 1, 1, m // 60, m % 60, s)
    points = spark.createDataFrame(
        [(1, 7, t(10)), (2, 7, t(20)), (3, 7, t(55)), (4, 7, t(200)),
         (5, 8, t(10))],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, t(10), t(20), "a"),    # [10, 20): point 1 in, point 2 OUT
         (7, t(20), t(90), "b"),    # spans several 10-min cells
         (8, t(0), t(30), "c")],
        "user_id long, start timestamp, end timestamp, tag string",
    )
    out = range_join(points, intervals, keys=("user_id",),
                     bucket="10 minutes")
    got = sorted((r["event_id"], r["tag"]) for r in out.collect())
    assert got == [(1, "a"), (2, "b"), (3, "b"), (5, "c")]


def test_range_join_plan_is_equi_join(spark):
    from searchengine_spark.ops.temporal import range_join
    import contextlib
    import io

    points = spark.createDataFrame([], "event_id long, user_id long, ts timestamp")
    intervals = spark.createDataFrame(
        [], "user_id long, start timestamp, end timestamp")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(points, intervals, keys=("user_id",)).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    with pytest.raises(ValueError, match="inner"):
        range_join(points, intervals, how="left")


def test_asof_join_right_tie_is_deterministic(spark):
    """Two right rows at the identical (key, ts): the pick is the greatest
    payload struct, stable across runs/partitionings."""
    from searchengine_spark.ops.temporal import asof_join

    L = "event_id long, user_id long, ts timestamp"
    R = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1, 0, 5)
    left = spark.createDataFrame([(1, 7, dt.datetime(2024, 1, 1, 0, 9))], L)
    right = spark.createDataFrame([(7, t0, 1.0), (7, t0, 9.0), (7, t0, 4.0)], R)
    for parts in (1, 3, 7):
        got = asof_join(left, right.repartition(parts)).collect()
        assert [(r["event_id"], r["matched_value"]) for r in got] == [(1, 9.0)]


def test_top_types_per_window(spark):
    from searchengine_spark.streaming.analytics import top_types_per_window

    got = sorted(
        (str(r["window_start"]), r["rank"], r["event_type"], r["n_events"])
        for r in top_types_per_window(
            spark.createDataFrame(ROWS, SCHEMA), "10 minutes", 2
        ).collect()
    )
    # window [00:00,00:10): click x2, view x1 -> ranks 1,2
    # window [00:10,00:20): click x1, error x1 -> tie broken type asc
    assert got == sorted([
        ("2024-01-01 00:00:00", 1, "click", 2),
        ("2024-01-01 00:00:00", 2, "view", 1),
        ("2024-01-01 00:10:00", 1, "click", 1),
        ("2024-01-01 00:10:00", 2, "error", 1),
        ("2024-01-01 00:50:00", 1, "view", 1),
        ("2024-01-01 01:00:00", 1, "view", 1),
    ])


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """session_window through a real Structured Stream: append mode emits
    each session exactly once, after the watermark passes its end. A
    second batch far in the future finalizes every batch-1 session; the
    emitted set must equal the batch run over batch-1 rows."""
    from searchengine_spark.streaming.analytics import sessionize

    src = str(tmp_path / "sess_src")
    rows = [_row(i, m, t, v) for i, m, t, v in
            [(0, 1, "click", 1.0), (1, 5, "view", 2.0), (2, 40, "click", 3.0),
             (3, 95, "view", 4.0), (4, 97, "click", 5.0)]]
    rows = [(i, ts, 0, t, v, p) for i, ts, _, t, v, p in rows]  # one user
    far_future = [(99, dt.datetime(2024, 1, 1, 5, 0), 0, "view", 0.5, "{}")]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA).parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessionize(stream, 600)
        .writeStream.format("memory").queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(far_future, SCHEMA).coalesce(1).write.mode(
            "append").parquet(src)
        q.processAllAvailable()
        got = sorted(
            (str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in spark.sql("SELECT * FROM sess_test").collect()
        )
    finally:
        q.stop()
    want = sorted(
        (str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(
            spark.createDataFrame(rows, SCHEMA), 600).collect()
    )
    assert got == want  # every batch-1 session finalized exactly once


# ---------------------------------------------------------------- funnel
def test_funnel_ordering_and_horizon(spark):
    from searchengine_spark.streaming.analytics import funnel

    t = lambda m: dt.datetime(2024, 1, 1, m // 60, m % 60)
    rows = [
        # user 1: full ordered funnel
        (1, t(0), 1, "view", 0.0, "{}"),
        (2, t(5), 1, "click", 0.0, "{}"),
        (3, t(9), 1, "purchase", 0.0, "{}"),
        # user 2: click BEFORE view -> stops after view
        (4, t(1), 2, "click", 0.0, "{}"),
        (5, t(2), 2, "view", 0.0, "{}"),
        # user 3: completes but outside the 10-min horizon
        (6, t(0), 3, "view", 0.0, "{}"),
        (7, t(5), 3, "click", 0.0, "{}"),
        (8, t(30), 3, "purchase", 0.0, "{}"),
        # user 4: same-timestamp view+click must NOT chain
        (9, t(0), 4, "view", 0.0, "{}"),
        (10, t(0), 4, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["view", "click", "purchase"], 600).collect()
    }
    # views: users 1,2,3,4; click-after-view within 10m: 1,3; purchase: 1
    assert got == {"view": 4, "click": 2, "purchase": 1}
    # no horizon: user 3 purchases too
    got2 = {
        r["step"]: r["n_users"]
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got2 == {"view": 4, "click": 2, "purchase": 2}


def test_funnel_matches_duckdb_twin(spark):
    import duckdb

    from searchengine_spark.streaming.analytics import funnel, funnel_sql

    ev = spark.createDataFrame(ROWS, SCHEMA)
    got = sorted(map(tuple, funnel(ev, ["click", "view"], 3600).collect()))
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    want = sorted(map(tuple, con.execute(
        funnel_sql("events", ["click", "view"], 3600)).fetchall()))
    assert got == want


def test_retention_cohorts(spark):
    from searchengine_spark.streaming.analytics import retention_cohorts

    day = lambda d, h=0: dt.datetime(2024, 1, 1 + d, h)
    rows = [
        (1, day(0), 1, "view", 0.0, "{}"),   # u1 cohort day0
        (2, day(0, 5), 1, "click", 0.0, "{}"),  # same day: one active row
        (3, day(2), 1, "view", 0.0, "{}"),   # u1 active day2
        (4, day(1), 2, "view", 0.0, "{}"),   # u2 cohort day1
        (5, day(2), 2, "view", 0.0, "{}"),   # u2 active day2
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["cohort"], r["period_no"]): r["n_users"]
        for r in retention_cohorts(ev, 86_400).collect()
    }
    d0 = 19723  # 2024-01-01 epoch-days
    assert got == {
        (d0, 0): 1, (d0, 2): 1,        # u1: day0 cohort, back on day2
        (d0 + 1, 0): 1, (d0 + 1, 1): 1,  # u2: day1 cohort, back day2
    }


def test_range_join_drops_inverted_and_empty_intervals(spark):
    """sequence(a, b) with a > b counts DOWN — one corrupt interval with
    swapped bounds used to fan out into an unbounded cell explosion."""
    from pyspark.sql import functions as F

    from searchengine_spark.ops.temporal import range_join

    points = spark.createDataFrame(
        [(1, "2020-01-01 00:30:00")], "pid long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [
            (10, "2020-01-01 00:00:00", "2020-01-01 01:00:00"),  # valid
            (11, "2020-01-01 00:00:00", "1970-01-02 00:00:00"),  # inverted
            (12, "2020-01-01 00:30:00", "2020-01-01 00:30:00"),  # empty
        ],
        "iid long, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    out = range_join(
        points, intervals, ts_col="ts", start_col="s", end_col="e",
        bucket="1 HOUR", keys=(),
    )
    assert [r["iid"] for r in out.collect()] == [10]


def test_asof_join_null_keys_never_match(spark):
    """NULL join keys must come back UNMATCHED (the DuckDB ASOF twin's
    equality never matches NULLs; the window used to group them)."""
    from searchengine_spark.ops.temporal import asof_join

    left = spark.createDataFrame(
        [(None, 5), (1, 5)], "uid int, ts int"
    )
    right = spark.createDataFrame(
        [(None, 3, 99), (1, 3, 7)], "uid int, ts int, v int"
    )
    out = {
        (r["uid"], r["ts"]): r["r_v"]
        for r in asof_join(
            left, right, on="uid", ts_col="ts", right_cols=("v",),
            prefix="r_",
        ).collect()
    }
    assert out[(1, 5)] == 7
    assert out[(None, 5)] is None
