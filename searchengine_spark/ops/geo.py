"""Geo-distance search (Elasticsearch ``geo_distance`` query + sort,
Lucene LatLonPoint): filter docs within a radius of a point and rank by
great-circle distance.

Reference parity note: the reference (GuyShimony/SearchEngine) has no geo
surface; this is engine-completion in the same spirit as the other ES
analogues, kept honest by a DuckDB haversine twin in the driver entry.

Scale design — the point is WHERE the distance predicate runs:

* ``geo_distance_search`` wraps the exact haversine in a SARGABLE
  bounding-box prune on the raw lat/lon columns. Min/max row-group
  statistics answer a between-predicate for free, so on a corpus laid out
  by ``add_geo_cells`` (write ``partitionBy("geo_cell")`` or Z-order by
  cell) the scan touches only the files whose box intersects the query
  box — the Lucene points-tree analogue, expressed as storage layout +
  predicate pushdown instead of a driver-side index.
* trig stays JVM-side (built-in column functions inside whole-stage
  codegen); no UDF anywhere.
* top-k by distance is orderBy().limit() → TakeOrderedAndProject
  (per-partition heaps, no global sort).

Limits (documented, not silent): the bounding box does not wrap the
antimeridian (a query box crossing ±180° falls back to the full lon
range) and pole-adjacent queries widen the box to all longitudes — both
conservative (a wider box only costs scan, never correctness; the exact
haversine filter still decides membership).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_R_KM = 6371.0088  # IUGG mean Earth radius
_COS_EPS = 1e-12


def haversine_km(lat1, lon1, lat2, lon2):
    """Column expr: great-circle distance in km between two (lat, lon)
    pairs in degrees — 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))),
    all built-in JVM trig (whole-stage codegen, no UDF)."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlmb / 2), 2)
    )
    return F.lit(2.0 * EARTH_R_KM) * F.asin(F.sqrt(a))


def add_geo_cells(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 1.0,
    out_col: str = "geo_cell",
) -> DataFrame:
    """Attach a grid-cell id: floor((lat+90)/cell)·(360/cell) +
    floor((lon+180)/cell). Content-free and computable by any writer or
    router — the partitioning/Z-order key for geo layouts (see module
    docstring). cell_deg trades file count against prune precision.

    The exact boundary points lat=90 / lon=180 are clamped into the last
    valid cell (same epsilon as ``_box_cells``): unclamped they would land
    one cell past the range the read-side prune enumerates and the stored
    row would silently vanish from every pruned query."""
    n_lon = int(math.ceil(360.0 / cell_deg))
    lat = F.least(F.col(lat_col), F.lit(90.0 - 1e-12))
    lon = F.least(F.col(lon_col), F.lit(180.0 - 1e-12))
    cell = (
        F.floor((lat + 90.0) / cell_deg) * n_lon
        + F.floor((lon + 180.0) / cell_deg)
    )
    return df.withColumn(out_col, cell.cast("long"))


def _bounding_box(lat0: float, lon0: float, radius_km: float):
    """(lat_lo, lat_hi, lon_lo, lon_hi) of a box guaranteed to contain the
    radius_km circle around (lat0, lon0). Pole/antimeridian overflow
    widens to the full range (conservative — see module docstring)."""
    dlat = math.degrees(radius_km / EARTH_R_KM)
    lat_lo, lat_hi = lat0 - dlat, lat0 + dlat
    cos_lat = math.cos(math.radians(lat0))
    # the widest parallel inside the box bounds the needed lon half-width
    cos_edge = min(
        math.cos(math.radians(max(-90.0, lat_lo))),
        math.cos(math.radians(min(90.0, lat_hi))),
        cos_lat,
    )
    if lat_lo <= -90.0 or lat_hi >= 90.0 or cos_edge <= 1e-12:
        return max(lat_lo, -90.0), min(lat_hi, 90.0), -180.0, 180.0
    dlon = math.degrees(radius_km / (EARTH_R_KM * cos_edge))
    if dlon >= 180.0 or lon0 - dlon < -180.0 or lon0 + dlon > 180.0:
        return max(lat_lo, -90.0), min(lat_hi, 90.0), -180.0, 180.0
    return max(lat_lo, -90.0), min(lat_hi, 90.0), lon0 - dlon, lon0 + dlon


def geo_distance_search(
    df: DataFrame,
    lat0: float,
    lon0: float,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    dist_col: str = "dist_km",
) -> DataFrame:
    """All rows within radius_km of (lat0, lon0), with the exact haversine
    distance attached (ES ``geo_distance`` filter). The sargable
    bounding-box predicate runs FIRST — that is the part parquet min/max
    stats and a geo-cell layout can prune on; the exact haversine then
    decides membership, so the box being conservative never changes the
    result set."""
    lat_lo, lat_hi, lon_lo, lon_hi = _bounding_box(lat0, lon0, radius_km)
    boxed = df.filter(
        F.col(lat_col).between(lat_lo, lat_hi)
        & F.col(lon_col).between(lon_lo, lon_hi)
    )
    d = haversine_km(F.lit(float(lat0)), F.lit(float(lon0)), F.col(lat_col), F.col(lon_col))
    return boxed.withColumn(dist_col, d).filter(F.col(dist_col) <= float(radius_km))


def geo_distance_topk(
    df: DataFrame,
    lat0: float,
    lon0: float,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "doc_id",
    radius_km: float | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """k nearest rows to (lat0, lon0) by great-circle distance (ES
    ``geo_distance`` sort). With ``radius_km`` the scan is box-pruned
    first (the common "nearest within X" query); without it this is a
    full-scan TakeOrderedAndProject — exact, and the right baseline shape.
    Ties break on id. Returns (id, dist_km) ascending."""
    if radius_km is not None:
        src = geo_distance_search(df, lat0, lon0, radius_km, lat_col, lon_col)
        d = F.col("dist_km")
    else:
        src = df.withColumn(
            "dist_km",
            haversine_km(
                F.lit(float(lat0)), F.lit(float(lon0)), F.col(lat_col), F.col(lon_col)
            ),
        )
        d = F.col("dist_km")
    if round_dp is not None:
        src = src.withColumn("dist_km", F.round(d, round_dp))
    return (
        src.select(id_col, "dist_km")
        .orderBy(F.asc("dist_km"), F.asc(id_col))
        .limit(k)
    )


def geo_distance_join(
    left: DataFrame,
    radius_km: float,
    right: DataFrame | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "doc_id",
    dist_col: str = "dist_km",
    round_dp: int | None = None,
) -> DataFrame:
    """All pairs within ``radius_km`` of each other (ES has no pair join;
    this is the Sedona/PostGIS ``ST_DWithin`` self/two-table join shape) —
    WITHOUT a cross join, via a uniform grid-cell equi-join.

    How the shuffle is bounded: cell size = the radius's latitude span
    (clamped to [1e-6°, 45°]; the lat offset range grows with the clamp),
    so a match's lat cells differ by at most ``mlat``. The left side keeps
    its single home cell; the right side is replicated into the neighbour
    cells its radius circle can reach, where m is the per-row longitude
    span in cells (1/cos of the row's most poleward reachable latitude —
    wider near the poles, exactly as the geometry demands, capped at the
    full band so polar rows stay correct). Longitude offsets wrap modulo
    the band width, so the antimeridian needs no special case. The join is
    then a plain hash equi-join on the composite cell id — never a
    CartesianProduct (plan-tested) — and each candidate pair meets exactly
    once because the left row owns exactly one cell and the right row's
    replica cells are distinct. The exact haversine decides membership, so
    grid coarseness only costs candidates, never correctness.

    Self-join (``right=None``): returns each unordered pair once with
    ``id_a < id_b``. Two-table: all (left, right) pairs within radius.

    100 TB notes: replication factor is ~3·(2m+1) ≈ 9 rows at mid
    latitudes; hot cells (dense metros) are ordinary join skew — AQE
    skew-join splits them, and a finer ``cell_deg`` (pass a smaller
    radius-derived grid via ``radius_km``) trades replication for balance.
    Output is pair-bounded, so the exact filter runs map-side after the
    join with no further shuffle.
    """
    radius_km = float(radius_km)
    if radius_km <= 0:
        raise ValueError("radius_km must be positive")
    cell_deg = min(max(math.degrees(radius_km / EARTH_R_KM), 1e-6), 45.0)
    n_lon = int(math.ceil(360.0 / cell_deg))
    n_band = n_lon  # one shared lon resolution for every band
    m_cap = (n_lon // 2) + 1  # offsets −cap..cap cover the whole band

    def _cells(df: DataFrame, side: str) -> DataFrame:
        lat_cell = F.floor((F.col(lat_col) + 90.0) / cell_deg).cast("long")
        lon_cell = F.floor((F.col(lon_col) + 180.0) / cell_deg).cast("long")
        return df.select(
            F.col(id_col).alias(f"id_{side}"),
            F.col(lat_col).alias(f"lat_{side}"),
            F.col(lon_col).alias(f"lon_{side}"),
            lat_cell.alias("lat_cell"),
            lon_cell.alias("lon_cell"),
        )

    l = _cells(left, "a").withColumn(
        "cell", F.col("lat_cell") * n_band + F.pmod(F.col("lon_cell"), F.lit(n_lon))
    ).drop("lat_cell", "lon_cell")

    r = _cells(left if right is None else right, "b")
    # most poleward latitude reachable from this row within the radius
    dlat = math.degrees(radius_km / EARTH_R_KM)
    mlat = int(math.ceil(dlat / cell_deg))  # >1 only when cell_deg clamped
    reach = F.least(F.abs(F.col("lat_b")) + F.lit(dlat), F.lit(90.0))
    cos_reach = F.cos(F.radians(reach))
    # lon half-width in cells at that latitude; full band when degenerate
    m = F.when(
        cos_reach <= F.lit(_COS_EPS), F.lit(m_cap)
    ).otherwise(
        F.least(
            F.ceil(F.lit(dlat) / (cos_reach * F.lit(cell_deg))).cast("long"),
            F.lit(m_cap),
        )
    ).cast("int")
    # distinct replica cells built as one array per row (no dedupe shuffle);
    # offsets past a full lon wrap revisit a cell — array_distinct keeps one
    cells = F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.lit(-mlat), F.lit(mlat)),
                lambda di: F.transform(
                    F.sequence(-m, m),
                    lambda dj: (F.col("lat_cell") + di) * n_band
                    + F.pmod(F.col("lon_cell") + dj, F.lit(n_lon)),
                ),
            )
        )
    )
    r = r.withColumn("cell", F.explode(cells)).select(
        "id_b", "lat_b", "lon_b", "cell"
    )

    d = haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    pairs = (
        l.join(r, "cell")
        .withColumn(dist_col, F.round(d, round_dp) if round_dp is not None else d)
        .filter(F.col(dist_col) <= radius_km)
    )
    if right is None:
        pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b", dist_col)


# ----------------------------------------------------- stored geo layout
# The points-tree-as-storage design the module docstring promises, made
# code (same pattern as ops/similarity.lsh_write): rows written
# partitionBy(geo_cell) so a radius query's cell set lands in the scan's
# PartitionFilters and only the intersecting directories are read.

_GEO_META = "_geo_meta.json"
_MAX_PRUNE_CELLS = 4096  # beyond this an IN-list stops paying; box-scan


def _geo_meta_path(path: str) -> str:
    import os

    return os.path.join(path, _GEO_META)


def geo_write(
    df: DataFrame,
    path: str,
    cell_deg: float = 1.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> None:
    """Materialize the geo layout: rows + their grid cell, written
    ``partitionBy(geo_cell)``. The pre-write ``repartition(geo_cell)``
    clusters each cell into one task's output (see lsh_write on the
    partitioned-write file-explosion why; at 100 TB you'd
    repartition(N, geo_cell) sized to the per-file target). cell_deg is
    pinned in a meta sidecar so probe enumeration always matches the
    stored assignment."""
    import json
    import os

    out = add_geo_cells(df, lat_col, lon_col, cell_deg)
    out.repartition("geo_cell").write.mode("overwrite").partitionBy("geo_cell").parquet(path)
    os.makedirs(path, exist_ok=True)
    tmp = _geo_meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"kind": "geo", "cell_deg": cell_deg,
                   "lat_col": lat_col, "lon_col": lon_col}, f)
    os.replace(tmp, _geo_meta_path(path))


def read_geo_meta(path: str) -> dict:
    import json

    with open(_geo_meta_path(path)) as f:
        return json.load(f)


def _box_cells(lat0: float, lon0: float, radius_km: float, cell_deg: float):
    """Grid cells intersecting the query circle's bounding box, or None
    when the enumeration would exceed _MAX_PRUNE_CELLS (the exact filter
    still decides membership — pruning is purely a scan optimization).
    _bounding_box never wraps lon (it widens to the full range instead),
    so the lon cell range here is always contiguous."""
    lat_lo, lat_hi, lon_lo, lon_hi = _bounding_box(lat0, lon0, radius_km)
    n_lon = int(math.ceil(360.0 / cell_deg))
    la_lo = int(math.floor((lat_lo + 90.0) / cell_deg))
    la_hi = int(math.floor((min(lat_hi, 90.0 - 1e-12) + 90.0) / cell_deg))
    lo_lo = int(math.floor((lon_lo + 180.0) / cell_deg))
    lo_hi = int(math.floor((min(lon_hi, 180.0 - 1e-12) + 180.0) / cell_deg))
    n = (la_hi - la_lo + 1) * (lo_hi - lo_lo + 1)
    if n > _MAX_PRUNE_CELLS:
        return None
    return [
        la * n_lon + lo
        for la in range(la_lo, la_hi + 1)
        for lo in range(lo_lo, lo_hi + 1)
    ]


def geo_stored_search(
    spark,
    path: str,
    lat0: float,
    lon0: float,
    radius_km: float,
    dist_col: str = "dist_km",
) -> DataFrame:
    """Radius query over a ``geo_write`` layout: the intersecting-cell
    IN-filter lands in the scan's PartitionFilters (plan-tested), so only
    the box's share of the stored bytes is read; the exact haversine in
    geo_distance_search then decides membership, so the result set is
    identical to the unpruned path."""
    meta = read_geo_meta(path)
    assert meta["kind"] == "geo", f"not a geo layout: {path}"
    df = spark.read.parquet(path)
    cells = _box_cells(lat0, lon0, radius_km, meta["cell_deg"])
    if cells is not None:
        df = df.filter(F.col("geo_cell").isin(cells))
    return geo_distance_search(
        df, lat0, lon0, radius_km, meta["lat_col"], meta["lon_col"], dist_col
    ).drop("geo_cell")


def geo_stored_topk(
    spark,
    path: str,
    lat0: float,
    lon0: float,
    k: int,
    radius_km: float,
    id_col: str = "doc_id",
    round_dp: int | None = None,
) -> DataFrame:
    """k nearest within radius over a stored layout — cell-pruned scan,
    then the ordinary TakeOrderedAndProject. The radius is required: a
    radius-free nearest-k cannot prune (any cell might hold the nearest
    point); expanding-ring search is the follow-on if that's ever hot."""
    src = geo_stored_search(spark, path, lat0, lon0, radius_km)
    d = F.col("dist_km")
    if round_dp is not None:
        src = src.withColumn("dist_km", F.round(d, round_dp))
    return (
        src.select(id_col, "dist_km")
        .orderBy(F.asc("dist_km"), F.asc(id_col))
        .limit(k)
    )


# web-mercator latitude bound (ES geotile_grid clips exactly here)
MERC_LAT_MAX = 85.05112878


def geotile_cells(
    df: DataFrame, zoom: int, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """ES ``geotile_grid`` cell assignment: web-mercator z/x/y map tiles
    (the slippy-map scheme every tile server uses). Latitudes clip to
    ±85.05112878 like ES; x/y clamp into [0, 2^z) so lon = 180 / the pole
    rows land in the edge tile instead of overflowing. Pure column math —
    stateless, codegen, no shuffle."""
    if not 0 <= zoom <= 29:
        raise ValueError("zoom must be in [0, 29]")
    n = float(1 << zoom)
    lat = F.greatest(
        F.lit(-MERC_LAT_MAX), F.least(F.lit(MERC_LAT_MAX), F.col(lat_col))
    )
    lat_r = F.radians(lat)
    x = F.floor(n * (F.col(lon_col) + 180.0) / 360.0)
    y = F.floor(
        n * (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi) / 2.0
    )
    clamp = lambda c: F.greatest(F.lit(0), F.least(F.lit(int(n) - 1), c)).cast("int")  # noqa: E731
    return df.withColumn("tile_x", clamp(x)).withColumn("tile_y", clamp(y))


def geotile_grid(
    df: DataFrame, zoom: int, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """ES ``geotile_grid`` aggregation: doc counts per web-mercator tile —
    the heat-map/cluster-map primitive. One hash aggregation with map-side
    partials; at 100 TB the tile key is also the natural layout key
    (``geo_write``-style partitioning makes any map viewport a pruned
    scan). Returns (tile_x, tile_y, n)."""
    return (
        geotile_cells(df, zoom, lat_col, lon_col)
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def geotile_grid_sql(
    table: str, zoom: int, lat_expr: str = "lat", lon_expr: str = "lon"
) -> str:
    """DuckDB twin of ``geotile_grid`` — same clip, same mercator math,
    same clamping."""
    n = float(1 << zoom)
    hi = int(n) - 1
    lat = f"greatest(-{MERC_LAT_MAX!r}, least({MERC_LAT_MAX!r}, {lat_expr}))"
    x = f"floor({n!r} * ({lon_expr} + 180.0) / 360.0)"
    y = (
        f"floor({n!r} * (1.0 - ln(tan(radians({lat})) + 1.0 / cos(radians({lat})))"
        f" / pi()) / 2.0)"
    )
    clamp = lambda c: f"greatest(0, least({hi}, {c}))::INT"  # noqa: E731
    return f"""
SELECT {clamp(x)} AS tile_x, {clamp(y)} AS tile_y, count(*)::BIGINT AS n
FROM {table}
GROUP BY 1, 2
"""
