"""Geo-distance search: the sargable bounding-box prune must never change
the result set (the box-free haversine truth is the oracle, here via a
pure-Python twin and in the driver via DuckDB), distances must match the
textbook formula, and top-k must rank by exact great-circle distance.

Reference parity note: the reference has no geo surface; `ops/geo.py`
docstring carries the layout/pushdown scale design."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops.geo import (
    EARTH_R_KM,
    _bounding_box,
    add_geo_cells,
    geo_distance_search,
    geo_distance_topk,
    haversine_km,
)


def _hav(lat1, lon1, lat2, lon2):
    dphi = math.radians(lat2 - lat1)
    dlmb = math.radians(lon2 - lon1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlmb / 2) ** 2
    )
    return 2 * EARTH_R_KM * math.asin(math.sqrt(a))


def _pts(spark, n=400):
    # deterministic full-range scatter, including pole/antimeridian extremes
    rows = [
        (i, (i * 7919 % 18000) / 100.0 - 90.0, (i * 104729 % 36000) / 100.0 - 180.0)
        for i in range(n)
    ] + [(9001, 89.9, 10.0), (9002, -89.9, -170.0), (9003, 0.0, 179.99), (9004, 0.0, -179.99)]
    return spark.createDataFrame(rows, "doc_id long, lat double, lon double")


def test_haversine_matches_python(spark):
    df = _pts(spark, 50).withColumn(
        "d", haversine_km(F.lit(37.7), F.lit(-122.4), F.col("lat"), F.col("lon"))
    )
    for r in df.collect():
        assert r["d"] == pytest.approx(_hav(37.7, -122.4, r["lat"], r["lon"]), abs=1e-6)


@pytest.mark.parametrize(
    "lat0,lon0,radius",
    [
        (10.0, 20.0, 500.0),
        (10.0, 20.0, 5000.0),
        (85.0, 0.0, 1000.0),     # pole-adjacent → full-lon widening
        (0.0, 179.5, 300.0),     # antimeridian → full-lon widening
        (-45.0, -170.0, 2500.0),
        (89.5, 50.0, 200.0),
    ],
)
def test_box_prune_never_changes_results(spark, lat0, lon0, radius):
    df = _pts(spark)
    got = {
        r["doc_id"] for r in geo_distance_search(df, lat0, lon0, radius).collect()
    }
    want = {
        r["doc_id"]
        for r in df.collect()
        if _hav(lat0, lon0, r["lat"], r["lon"]) <= radius
    }
    assert got == want


def test_box_contains_circle_geometry():
    # every point at exactly radius distance must satisfy the box predicate
    for lat0, lon0, radius in [(10, 20, 1000), (60, 100, 2000), (-30, -60, 800)]:
        lat_lo, lat_hi, lon_lo, lon_hi = _bounding_box(lat0, lon0, radius)
        for brg in range(0, 360, 15):
            # destination point formula
            d = radius / EARTH_R_KM
            phi1, lmb1, th = map(math.radians, (lat0, lon0, brg))
            phi2 = math.asin(
                math.sin(phi1) * math.cos(d) + math.cos(phi1) * math.sin(d) * math.cos(th)
            )
            lmb2 = lmb1 + math.atan2(
                math.sin(th) * math.sin(d) * math.cos(phi1),
                math.cos(d) - math.sin(phi1) * math.sin(phi2),
            )
            lat2, lon2 = math.degrees(phi2), math.degrees(lmb2)
            assert lat_lo - 1e-9 <= lat2 <= lat_hi + 1e-9
            assert lon_lo - 1e-9 <= lon2 <= lon_hi + 1e-9


def test_topk_matches_brute(spark):
    df = _pts(spark)
    got = [(r["doc_id"], r["dist_km"]) for r in geo_distance_topk(df, 10.0, 20.0, 10).collect()]
    want = sorted(
        ((r["doc_id"], _hav(10.0, 20.0, r["lat"], r["lon"])) for r in df.collect()),
        key=lambda t: (t[1], t[0]),
    )[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gd), (_, wd) in zip(got, want):
        assert gd == pytest.approx(wd, abs=1e-6)


def test_topk_with_radius_prunes_same(spark):
    df = _pts(spark)
    a = [(r["doc_id"], r["dist_km"]) for r in geo_distance_topk(df, 10.0, 20.0, 10, radius_km=8000.0).collect()]
    b = [(r["doc_id"], r["dist_km"]) for r in geo_distance_topk(df, 10.0, 20.0, 10).collect()]
    assert a == b


def test_geo_cells_deterministic_and_bounded(spark):
    df = add_geo_cells(_pts(spark), cell_deg=5.0)
    cells = df.select("geo_cell").distinct().count()
    assert 0 < cells <= (180 // 5 + 1) * (360 // 5 + 1)
    # same coords → same cell across recomputation
    again = add_geo_cells(_pts(spark), cell_deg=5.0)
    assert df.select("doc_id", "geo_cell").exceptAll(
        again.select("doc_id", "geo_cell")
    ).count() == 0


from searchengine_spark.ops.geo import geo_distance_join


def _brute_pairs(rows, radius):
    out = set()
    for i, (ai, alat, alon) in enumerate(rows):
        for bi, blat, blon in rows[i + 1:]:
            if _hav(alat, alon, blat, blon) <= radius:
                out.add((min(ai, bi), max(ai, bi)))
    return out


@pytest.mark.parametrize("radius", [150.0, 900.0, 4000.0, 9000.0])
def test_distance_join_matches_brute(spark, radius):
    # includes the pole/antimeridian extremes from _pts
    df = _pts(spark, 150)
    rows = [(r["doc_id"], r["lat"], r["lon"]) for r in df.collect()]
    got = [
        (r["id_a"], r["id_b"], r["dist_km"])
        for r in geo_distance_join(df, radius).collect()
    ]
    # exactly-once: no duplicate pairs from multi-cell replication
    assert len(got) == len({(a, b) for a, b, _ in got})
    assert {(a, b) for a, b, _ in got} == _brute_pairs(rows, radius)
    for a, b, d in got:
        la, lo = next((r[1], r[2]) for r in rows if r[0] == a)
        lb, lob = next((r[1], r[2]) for r in rows if r[0] == b)
        assert d == pytest.approx(_hav(la, lo, lb, lob), abs=1e-6)


def test_distance_join_antimeridian_and_pole_pairs(spark):
    rows = [
        (1, 0.0, 179.95),
        (2, 0.0, -179.95),   # ~22 km from 1, across the seam
        (3, 89.95, 10.0),
        (4, 89.95, -170.0),  # ~11 km from 3, across the pole
        (5, 0.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lat double, lon double")
    got = {(r["id_a"], r["id_b"]) for r in geo_distance_join(df, 50.0).collect()}
    assert got == {(1, 2), (3, 4)}


def test_distance_join_two_table(spark):
    left = _pts(spark, 60)
    right = spark.createDataFrame(
        [(9101, 10.0, 20.0), (9102, -50.0, 150.0)],
        "doc_id long, lat double, lon double",
    )
    radius = 2000.0
    got = {(r["id_a"], r["id_b"]) for r in geo_distance_join(left, radius, right=right).collect()}
    lrows = [(r["doc_id"], r["lat"], r["lon"]) for r in left.collect()]
    want = {
        (li, ri)
        for li, la, lo in lrows
        for ri, rla, rlo in [(9101, 10.0, 20.0), (9102, -50.0, 150.0)]
        if _hav(la, lo, rla, rlo) <= radius
    }
    assert got == want


def test_distance_join_no_cartesian_product(spark):
    df = _pts(spark, 100)
    plan = geo_distance_join(df, 500.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


from searchengine_spark.ops.geo import (
    geo_stored_search,
    geo_stored_topk,
    geo_write,
)


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _files_scanned(df) -> int:
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return int(leaf.metrics().apply("numFiles").value())


@pytest.fixture(scope="module")
def geo_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("geo") / "layout")
    geo_write(_pts(spark, 300), p, cell_deg=15.0)
    return p


def test_stored_search_matches_unpruned(spark, geo_path):
    df = _pts(spark, 300)
    for lat0, lon0, radius in [(10.0, 20.0, 900.0), (85.0, 0.0, 1200.0), (0.0, 179.5, 500.0)]:
        got = {r["doc_id"] for r in geo_stored_search(spark, geo_path, lat0, lon0, radius).collect()}
        want = {r["doc_id"] for r in geo_distance_search(df, lat0, lon0, radius).collect()}
        assert got == want


def test_stored_scan_is_partition_pruned(spark, geo_path):
    q = geo_stored_search(spark, geo_path, 10.0, 20.0, 900.0)
    plan = _plan_of(q)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "geo_cell" in pf[0]
    total = _files_scanned(spark.read.parquet(geo_path))
    pruned = _files_scanned(q)
    assert pruned < total


def test_stored_topk_matches_compute(spark, geo_path):
    df = _pts(spark, 300)
    got = [(r["doc_id"], r["dist_km"]) for r in geo_stored_topk(spark, geo_path, 10.0, 20.0, 10, radius_km=8000.0).collect()]
    want = [(r["doc_id"], r["dist_km"]) for r in geo_distance_topk(df, 10.0, 20.0, 10, radius_km=8000.0).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gd), (_, wd) in zip(got, want):
        assert gd == pytest.approx(wd, abs=1e-9)


def test_stored_huge_radius_falls_back_to_full_scan(spark, tmp_path):
    # tiny cells + planet-wide box → enumeration over the cap → unpruned,
    # still correct
    p = str(tmp_path / "fine")
    geo_write(_pts(spark, 80), p, cell_deg=0.5)
    df = _pts(spark, 80)
    got = {r["doc_id"] for r in geo_stored_search(spark, p, 0.0, 0.0, 15000.0).collect()}
    want = {r["doc_id"] for r in geo_distance_search(df, 0.0, 0.0, 15000.0).collect()}
    assert got == want


def test_stored_layout_keeps_exact_boundary_points(spark, tmp_path):
    """lat=90 / lon=180 land one raw cell PAST the range the read-side
    prune enumerates; the writer clamps them into the last valid cell so
    a pruned radius query still finds them. Regression: unclamped, the
    pole/antimeridian rows silently vanished from every pruned query
    while the unpruned path returned them."""
    rows = [
        (1, 90.0, 10.0),    # exact north pole
        (2, 0.0, 180.0),    # exact antimeridian
        (3, 89.0, 10.0),
        (4, 0.0, 179.0),
        (5, -45.0, 30.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lat double, lon double")
    p = str(tmp_path / "geo_edge")
    geo_write(df, p, cell_deg=10.0)
    for lat0, lon0, radius, must_have in [
        (89.5, 10.0, 200.0, 1),
        (0.0, 179.5, 200.0, 2),
    ]:
        got = {r["doc_id"] for r in
               geo_stored_search(spark, p, lat0, lon0, radius).collect()}
        want = {r["doc_id"] for r in
                geo_distance_search(df, lat0, lon0, radius).collect()}
        assert must_have in got
        assert got == want


# ------------------------------------------------------------ geotile_grid
def test_geotile_known_tiles(spark):
    """Anchor tiles at zoom 1 and 2 against hand-computed slippy-map
    values (0,0 is the north-west tile)."""
    from searchengine_spark.ops.geo import geotile_cells

    pts = [
        (1, 0.0, 0.0),       # equator/greenwich: z1 -> (1, 1)
        (2, 51.5, -0.1),     # London: z1 -> (0, 0)
        (3, -33.9, 151.2),   # Sydney: z1 -> (1, 1); z2 -> (3, 2)
        (4, 89.9, 179.9),    # pole/date-line corner clamps into range
        (5, -89.9, -179.9),
    ]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    z1 = {r["doc_id"]: (r["tile_x"], r["tile_y"])
          for r in geotile_cells(df, 1).collect()}
    assert z1[1] == (1, 1) and z1[2] == (0, 0) and z1[3] == (1, 1)
    assert z1[4] == (1, 0) and z1[5] == (0, 1)
    z2 = {r["doc_id"]: (r["tile_x"], r["tile_y"])
          for r in geotile_cells(df, 2).collect()}
    assert z2[3] == (3, 2) and z2[2] == (1, 1)
    import pytest as _pt

    with _pt.raises(ValueError):
        geotile_cells(df, 30)


def test_geotile_grid_counts_partition_the_corpus(spark):
    """Tile counts sum to the corpus size (every point lands in exactly
    one clamped tile) and match the DuckDB twin."""
    import duckdb

    from searchengine_spark.ops.geo import geotile_grid, geotile_grid_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    geo = docs.selectExpr(
        "doc_id",
        "(doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat",
        "(doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon",
    )
    got = sorted(
        (r["tile_x"], r["tile_y"], r["n"])
        for r in geotile_grid(geo, 3).collect()
    )
    assert sum(n for _, _, n in got) == docs.count()
    con = duckdb.connect()
    con.register("geo_t", geo.toPandas())
    want = sorted(map(tuple, con.execute(
        geotile_grid_sql("geo_t", 3)
    ).fetchall()))
    assert got == want
