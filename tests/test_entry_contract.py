"""The driver contract (__spark_entry__.py) itself: loadable the way
the driver loads it, stable entry schema, oracle coverage accounted."""

import importlib.util
import os

# sketch-valued (engine-specific HLL / GK internals) — documented in
# operators/profile.py; everything else carries a DuckDB oracle.
KNOWN_ROWS_ONLY = {"q_approx_distinct", "q_approx_quantiles"}


def _load_entry():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contract_shape():
    mod = _load_entry()
    q, o = mod.queries(), mod.oracle_sql()
    assert len(q) >= 51
    assert set(o) <= set(q), "oracle for undeclared query"
    assert set(q) - set(o) == KNOWN_ROWS_ONLY, (
        "every query needs an oracle unless explicitly rows-only"
    )
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_entry_runs_and_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.columns
    assert df.count() > 0


def test_events_ts_dtype_canary(spark, sf_dir):
    """Dtype-drift canary: whatever way this Spark build decodes the
    parquet TIMESTAMP(NANOS) column (long nanos, TIMESTAMP_NTZ, plain
    timestamp), load_table must hand downstream code a session-TZ
    TimestampType. Round 2 shipped a crashed bench and three silently
    wrong streaming queries because this assumption drifted without a
    test — any future decode change must fail HERE first."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tfl_bikes_data_pipeline_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    assert isinstance(events.schema["ts"].dataType, T.TimestampType), (
        f"events.ts must normalize to TimestampType, got "
        f"{events.schema['ts'].dataType}"
    )
    # downstream idioms that broke in round 2 must analyze cleanly
    events.select(
        F.col("ts").cast("long"), F.unix_timestamp("ts"), F.hour("ts")
    ).first()


def test_events_ts_dtype_canary_plain_session(spark, sf_dir):
    """Same canary through the driver's code path: a *plain* session
    (no factory confs) must still get TimestampType, because
    load_table applies the runtime confs itself."""
    from pyspark.sql import types as T

    from tfl_bikes_data_pipeline_spark.tables import load_table

    plain = spark.newSession()  # fresh conf view, same SparkContext
    events = load_table(plain, sf_dir, "events")
    assert isinstance(events.schema["ts"].dataType, T.TimestampType)


def test_stream_batch_ts_parity(spark, sf_dir):
    """The streaming reader and the batch loader must agree on the ts
    column bit-for-bit (round 2: they drifted and streaming returned
    wrong answers). Compares min/max/count through both paths."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
        run_available_now,
        stage_landing_dir,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    stream = read_events_stream(spark, stage_landing_dir(sf_dir))
    agg = stream.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    )
    got = run_available_now(agg, spark).first()
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .first()
    )
    assert (got["n"], got["lo"], got["hi"]) == (want["n"], want["lo"], want["hi"])
