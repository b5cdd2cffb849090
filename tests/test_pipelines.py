"""Golden / property tests for the pipeline builders (reference
semantics from spark/transform_load.py, per SURVEY.md §5.2)."""

import tempfile

from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.plans.dim_time import build_dim_time
from tfl_bikes_data_pipeline_spark.plans.pipelines import (
    build_fact,
    raw_events,
    split_dim,
)
from tfl_bikes_data_pipeline_spark.warehouse import month_partition, write_partitioned


def test_dim_time_reference_range_rowcount(spark):
    """The reference's full range (2016-01-01..2022-01-31 23:59, minute
    grain) is ~3.2M rows (BASELINE.md): exactly 3,201,120 minutes
    (2,223 days plus the final 23:59 row, SURVEY.md §5.2)."""
    df = build_dim_time(spark)
    assert df.count() == 3_201_120


def test_dim_time_calendar_golden(spark):
    row = (
        build_dim_time(spark, "2021-01-01 00:00:00", "2021-01-01 00:01:00")
        .orderBy("id")
        .first()
    )
    assert row.year == 2021 and row.month == 1 and row.dayofmonth == 1
    assert row.weekofyear == 53  # ISO week of 2021-01-01
    assert row.hour == 0 and row.minute == 0
    assert row.id == 1609459200  # unix seconds surrogate key


def test_fact_build_types_and_ids(spark, sf_dir):
    fact = build_fact(raw_events(spark, sf_dir))
    assert dict(fact.dtypes)["event_id"] == "bigint"
    assert dict(fact.dtypes)["timestamp_id"] == "int"
    assert dict(fact.dtypes)["event_ts"] == "timestamp"
    r = fact.where(F.col("event_ts").isNotNull()).first()
    # surrogate id == unix seconds of the minute-grain timestamp
    assert r.timestamp_id == int(r.event_ts.timestamp())
    # dim split is 1:1 with the fact
    assert split_dim(fact).count() == fact.count()


def test_incremental_append_idempotent_month_rerun(spark):
    """Re-running a month must replace, not duplicate, that month's
    partition (dynamic partition overwrite), and leave other months
    untouched — the reference's first-run-overwrite/append flip."""
    from datetime import datetime

    rows = [
        (1, datetime(2021, 1, 5), 10.0),
        (2, datetime(2021, 1, 20), 11.0),
        (3, datetime(2021, 2, 3), 12.0),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double").withColumn(
        "ym", month_partition("ts")
    )
    out = tempfile.mkdtemp(prefix="idempotent_")
    write_partitioned(df, out, ["ym"], mode="overwrite")

    # re-run January only — with a corrected row set (one row dropped)
    jan_fixed = df.where((F.col("ym") == "202101") & (F.col("id") != 2))
    write_partitioned(jan_fixed, out, ["ym"], mode="overwrite")

    back = spark.read.parquet(out)
    counts = {r.ym: r.cnt for r in back.groupBy("ym").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"202101": 1, "202102": 1}


def test_null_accounting_left_join_tolerance(spark, sf_dir):
    """Reference tolerates missing weather (LEFT joins,
    docs/3_data_transformation.md:32): enrichment ids may be null but
    every fact row must survive."""
    from tfl_bikes_data_pipeline_spark.plans.pipelines import p_weather_ids
    from tfl_bikes_data_pipeline_spark.tables import load_table

    out = p_weather_ids(spark, sf_dir)
    assert out.count() == load_table(spark, sf_dir, "events").count()
