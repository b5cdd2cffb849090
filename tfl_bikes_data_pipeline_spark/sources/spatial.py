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
