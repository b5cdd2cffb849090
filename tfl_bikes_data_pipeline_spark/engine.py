"""The engine façade — the reference's three pipeline entry points as a
Python API over a partitioned-parquet warehouse.

Reference dispatch (``spark/transform_load.py:528-534``; submission args
``airflow/dags/spark_transform_load.py:85-92``):

- ``setup_database``          → ``run_stage(..., stage="setup")``
- ``transform_load_weather``  → ``run_stage(..., stage="weather", month=..)``
- ``transform_load_journeys`` → ``run_stage(..., stage="journeys", month=..)``

Semantics preserved: setup overwrites the generated time dimension and
the typed station dimension; the monthly stages transform exactly one
month slice and append it to month-partitioned tables, with re-runs of
the same month idempotent (dynamic partition overwrite replacing the
reference's first-run/append mode flip at ``transform_load.py:438,496``).
The fact stage derives its dimension-scan bounds from the incoming
slice, the reference's hand-rolled pushdown (``:460-483``) expressed as
a plain ``.where()`` that Catalyst pushes into the parquet reader.
"""

from __future__ import annotations

import calendar
import datetime
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.dim_time import build_dim_time
from .plans.pipelines import build_aligned_weather, build_fact, raw_events, split_dim
from .sources.spatial import grid_points, nearest_grid, station_coords
from .session import ensure_runtime_confs
from .tables import load_table
from .warehouse import month_partition, write_partitioned

STAGES = ("setup", "weather", "journeys")


def _month_slice(events: DataFrame, month: str) -> DataFrame:
    """One YYYYMM month of the feed (reference partition-path selection,
    ``transform_load.py:457``) — a partition-prunable predicate."""
    return events.where(F.date_format("ts", "yyyyMM") == month)


def run_stage(
    spark: SparkSession,
    warehouse_dir: str,
    stage: str,
    month: str | None = None,
    sf_dir: str | None = None,
    dim_time_bounds: tuple[str, str] = ("2021-01-01 00:00:00", "2021-12-31 23:59:00"),
) -> dict[str, str]:
    """Run one pipeline stage into ``warehouse_dir``. Returns the table
    paths written. ``sf_dir`` is the raw-source directory (the fixture
    dir locally; any parquet landing zone in production)."""
    if stage not in STAGES:
        raise ValueError(f"unknown stage {stage!r}; expected one of {STAGES}")
    if stage != "setup":
        # format-validate, not just truthiness: '2021-01' (the natural
        # ISO spelling) would match NO rows, write NO partitions, and
        # report success — a backfill loading zero data silently.
        if not month or not re.fullmatch(r"\d{4}(0[1-9]|1[0-2])", month):
            raise ValueError(
                f"stage {stage!r} requires month='YYYYMM' (got {month!r})"
            )
        # the idempotent-month-rerun contract REQUIRES dynamic partition
        # overwrite; assert it explicitly rather than relying on a
        # side-effect conf set with swallowed failures — static
        # overwrite here would delete every other month of the table.
        ensure_runtime_confs(spark)
        mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        if mode.lower() != "dynamic":
            raise RuntimeError(
                "partitionOverwriteMode must be 'dynamic' for monthly "
                f"stages (got {mode!r}) — a static overwrite would wipe "
                "all other months"
            )
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    written: dict[str, str] = {}

    if stage == "setup":
        # dim_time: generated, full-overwrite (transform_load.py:403-418)
        dim_time = build_dim_time(spark, *dim_time_bounds)
        p = f"{warehouse_dir}/dim_time"
        dim_time.write.mode("overwrite").parquet(p)
        written["dim_time"] = p
        # dim_locations analog: typed station dim + nearest grid cell
        # (transform_load.py:130-161 + ingest_weather_data.py:146-173)
        stations = station_coords(spark, sf_dir)
        grid = grid_points(spark)
        dim_loc = stations.join(nearest_grid(stations, grid), "station_id")
        p = f"{warehouse_dir}/dim_locations"
        dim_loc.write.mode("overwrite").parquet(p)
        written["dim_locations"] = p
        return written

    if stage == "weather":
        # aligned observation dimension for the month, month-partitioned
        # append (transform_load.py:240-292, 425-449)
        events = _month_slice(load_table(spark, sf_dir, "events"), month)
        dim_weather = build_aligned_weather(events).withColumn(
            "ym", month_partition("day")
        )
        p = f"{warehouse_dir}/dim_weather"
        write_partitioned(dim_weather, p, ["ym"], mode="overwrite")
        written["dim_weather"] = p
        return written

    # journeys: raw feed → typed fact + slim dim, enriched with the
    # month's observation ids, appended to month partitions
    # (transform_load.py:452-509)
    raw = raw_events(spark, sf_dir)
    fact = build_fact(raw)
    fact = _month_slice(fact.withColumnRenamed("event_ts", "ts"), month).withColumnRenamed(
        "ts", "event_ts"
    )
    # one parse of the raw feed serves all three consumers below (the
    # dim_rental write, the enrichment join, the fact write) — without
    # the persist each would re-scan and re-parse the feed in full.
    from pyspark import StorageLevel

    # keep a dedicated handle on the cached plan: `fact` is rebound to
    # derived DataFrames below (join / withColumn), and unpersisting a
    # derived plan is a silent no-op — the cache would leak once per
    # monthly invocation for the session's lifetime.
    fact_cached = fact.persist(StorageLevel.MEMORY_AND_DISK)
    fact = fact_cached
    try:
        dim_rental = split_dim(fact).withColumn("ym", F.lit(month))
        p = f"{warehouse_dir}/dim_rental"
        write_partitioned(dim_rental, p, ["ym"], mode="overwrite")
        written["dim_rental"] = p

        # bounded dimension scan: the month string itself determines the
        # day bounds (no eager scan of the slice needed), ym equality
        # gives true PARTITION pruning, and the day bounds prune row
        # groups within the month.
        weather_path = f"{warehouse_dir}/dim_weather"
        if _has_parquet_data(spark, weather_path):
            first = datetime.date(int(month[:4]), int(month[4:]), 1)
            last = first.replace(day=calendar.monthrange(first.year, first.month)[1])
            dim_weather = (
                spark.read.parquet(weather_path)
                .where(F.col("ym") == month)
                .where(
                    (F.col("day") >= F.lit(str(first)))
                    & (F.col("day") <= F.lit(f"{last} 23:59:59"))
                )
                .select(
                    F.col("user_id").alias("w_user"),
                    F.to_date("day").alias("w_day"),
                    F.col("id").alias("weather_id"),
                )
            )
            fact = fact.join(
                dim_weather,
                (F.col("user_id") == F.col("w_user"))
                & (F.to_date("event_ts") == F.col("w_day")),
                "left",
            ).drop("w_user", "w_day")
        else:
            fact = fact.withColumn("weather_id", F.lit(None).cast("string"))

        fact_out = fact.withColumn("ym", F.lit(month))
        p = f"{warehouse_dir}/fact_events"
        write_partitioned(fact_out, p, ["ym"], mode="overwrite")
        written["fact_events"] = p
        return written
    finally:
        fact_cached.unpersist()


def _has_parquet_data(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists AND holds at least one data file —
    probed through the Hadoop FileSystem API, so non-local warehouse
    URIs (hdfs://, s3a://) work exactly like warehouse.py's swap
    machinery (os.path.isdir would silently report False for them and
    disable enrichment). An existing-but-empty dir (a zero-row weather
    month wrote only _SUCCESS) must take the NULL-enrichment branch,
    not crash schema inference."""
    jvm = spark._jvm
    JPath = jvm.org.apache.hadoop.fs.Path
    jpath = JPath(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False
