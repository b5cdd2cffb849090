"""Nearest-grid-point spatial extraction (SURVEY.md §2.1 S9).

The reference matches ~800 docking stations to their nearest cell of a
1 km UK weather grid with a driver-side numpy euclidean argmin
(``airflow/dags/ingest_weather_data.py:114-181``, distance ``:151-163``).
Here the same semantics are a distributed Spark plan: stations ⨯
broadcast(grid) → squared euclidean distance → per-station argmin via a
lexicographic struct-MIN — one map-side-combined hash aggregate, no
window sort, no driver loop.

Scale posture: the grid side is the small one (a UK 1 km grid is ~230k
cells ≈ a few MB) so it broadcasts; the station/entity side can be
arbitrarily large and never shuffles more than the aggregate's partial
rows. Ties break deterministically on (distance, grid_id) because
struct-MIN compares fields left-to-right.

Coordinates here are integers derived from ``s_suppkey`` so the declared
query is exactly reproducible in the DuckDB oracle (integer arithmetic —
no float nondeterminism in the hash gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from ..tmputil import sweep_tmpdir

GRID_N = 20  # 20×20 grid
GRID_STEP = 5  # coordinate units between grid lines


def station_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic station locations: integer coords derived from the
    supplier key (stands in for the XML station feed's lat/long)."""
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        F.col("s_suppkey").cast("int").alias("station_id"),
        (F.col("s_suppkey") % 100).cast("int").alias("lat"),
        ((F.col("s_suppkey") * 7) % 100).cast("int").alias("lon"),
    )


def grid_points(spark: SparkSession, n: int = GRID_N, step: int = GRID_STEP) -> DataFrame:
    """The weather grid as a generated relation: ``grid_id = row*n + col``,
    coords at ``step`` spacing. ``spark.range`` is distributed — no
    driver-side materialization."""
    return spark.range(n * n).select(
        F.col("id").cast("int").alias("grid_id"),
        (F.expr(f"CAST(id DIV {n} AS INT)") * step).cast("int").alias("glat"),
        ((F.col("id") % n) * step).cast("int").alias("glon"),
    )


def nearest_grid(stations: DataFrame, grid: DataFrame) -> DataFrame:
    """Per-station nearest grid cell: broadcast cross join + struct-MIN
    argmin. Replaces the reference's per-station numpy loop
    (``ingest_weather_data.py:146-173``) with one distributed aggregate."""
    dlat = F.col("lat") - F.col("glat")
    dlon = F.col("lon") - F.col("glon")
    dist2 = (dlat * dlat + dlon * dlon).cast("int").alias("dist2")
    best = (
        stations.crossJoin(F.broadcast(grid))
        .select("station_id", dist2, "grid_id")
        .groupBy("station_id")
        .agg(F.min(F.struct("dist2", "grid_id")).alias("best"))
    )
    return best.select(
        "station_id",
        F.col("best.grid_id").alias("grid_id"),
        F.col("best.dist2").alias("dist2"),
    )


def q_spatial_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nearest_grid(station_coords(spark, sf_dir), grid_points(spark))


QUERIES = {"q_spatial_nearest": q_spatial_nearest}

ORACLES: dict[str, str] = {
    "q_spatial_nearest": f"""
        WITH stations AS (
            SELECT s_suppkey::INT AS station_id,
                   (s_suppkey % 100)::INT AS lat,
                   ((s_suppkey * 7) % 100)::INT AS lon
            FROM supplier
        ), grid AS (
            SELECT i::INT AS grid_id,
                   ((i // {GRID_N}) * {GRID_STEP})::INT AS glat,
                   ((i % {GRID_N}) * {GRID_STEP})::INT AS glon
            FROM range({GRID_N * GRID_N}) t(i)
        ), dists AS (
            SELECT station_id, grid_id,
                   ((lat - glat) * (lat - glat)
                    + (lon - glon) * (lon - glon))::INT AS dist2,
                   row_number() OVER (
                       PARTITION BY station_id
                       ORDER BY (lat - glat) * (lat - glat)
                                + (lon - glon) * (lon - glon), grid_id
                   ) AS rn
            FROM stations CROSS JOIN grid
        )
        SELECT station_id, grid_id, dist2 FROM dists WHERE rn = 1
    """,
}


# ---------------------------------------------------------------------------
# the full S9 edge: binary netCDF grid file → Spark → spatial extraction
# ---------------------------------------------------------------------------

NC_TIMES = 3


def weather_grid_from_netcdf(spark: SparkSession, path: str) -> DataFrame:
    """Parse a classic NetCDF-3 grid file ([[netcdf3]] stdlib codec)
    and surface the ``tas`` variable as a long-form Spark relation
    (t, gy, gx, tas). The driver-side array→rows conversion is the
    ingest-edge step (grid snapshots are a few MB — the reference's
    netCDF files are per-month station extracts, same magnitude); the
    relation is grid-sized, broadcastable, and everything downstream is
    distributed."""
    from .netcdf3 import parse_netcdf3

    dims, tas = parse_netcdf3(path)["tas"]
    nt, ny, nx = tas.shape
    rows = [
        (int(t), int(y), int(x), int(tas[t, y, x]))
        for t in range(nt)
        for y in range(ny)
        for x in range(nx)
    ]
    return spark.createDataFrame(rows, "t INT, gy INT, gx INT, tas INT")


def q_netcdf_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 end-to-end, the reference's weather path re-expressed: write
    a deterministic gridded ``tas`` snapshot as a BINARY classic
    NetCDF-3 file (integer-valued so the oracle can re-derive every
    cell arithmetically), parse it back through the stdlib codec, and
    join each station's nearest grid cell ([[q_spatial_nearest]]'s
    argmin) to its per-timestep values — (station_id, t, tas). Any
    corruption in the binary layer (offsets, big-endian decode, shape
    order) changes the extracted series and fails the hash."""
    import os

    import numpy as np

    from .netcdf3 import write_netcdf3

    tas = np.fromfunction(
        lambda t, y, x: t * 100000 + y * 1000 + x,
        (NC_TIMES, GRID_N, GRID_N),
    ).astype("int32")
    path = os.path.join(sweep_tmpdir("raw_nc_"), "tas.nc")
    write_netcdf3(
        path,
        {"time": NC_TIMES, "y": GRID_N, "x": GRID_N},
        {"tas": (("time", "y", "x"), tas)},
    )
    weather = weather_grid_from_netcdf(spark, path)
    nearest = nearest_grid(station_coords(spark, sf_dir), grid_points(spark))
    # grid_id = gy * GRID_N + gx (the generated grid's id scheme)
    cells = weather.select(
        (F.col("gy") * GRID_N + F.col("gx")).alias("grid_id"), "t", "tas"
    )
    return (
        nearest.join(F.broadcast(cells), "grid_id")
        .select("station_id", "t", "tas")
        .orderBy("station_id", "t")
    )


ORACLES["q_netcdf_weather"] = f"""
    WITH stations AS (
        SELECT s_suppkey::INT AS station_id,
               (s_suppkey % 100)::INT AS lat,
               ((s_suppkey * 7) % 100)::INT AS lon
        FROM supplier
    ), grid AS (
        SELECT i::INT AS grid_id,
               ((i // {GRID_N}) * {GRID_STEP})::INT AS glat,
               ((i % {GRID_N}) * {GRID_STEP})::INT AS glon
        FROM range({GRID_N * GRID_N}) t(i)
    ), nearest AS (
        SELECT station_id, grid_id FROM (
            SELECT station_id, grid_id,
                   row_number() OVER (
                       PARTITION BY station_id
                       ORDER BY (lat - glat) * (lat - glat)
                                + (lon - glon) * (lon - glon), grid_id
                   ) AS rn
            FROM stations CROSS JOIN grid
        ) WHERE rn = 1
    ), weather AS (
        SELECT (gy * {GRID_N} + gx)::INT AS grid_id, t::INT AS t,
               (t * 100000 + gy * 1000 + gx)::INT AS tas
        FROM range({NC_TIMES}) tt(t)
        CROSS JOIN range({GRID_N}) yy(gy)
        CROSS JOIN range({GRID_N}) xx(gx)
    )
    SELECT station_id, t, tas
    FROM nearest JOIN weather USING (grid_id)
    ORDER BY station_id, t
"""

QUERIES["q_netcdf_weather"] = q_netcdf_weather
