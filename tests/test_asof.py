"""As-of / range join semantics on crafted inputs (the oracle
differential proves engine-equivalence at scale; these pin the edge
cases)."""

from datetime import datetime

from tfl_bikes_data_pipeline_spark.operators.asof import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_matches_latest_prior_observation(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-02 12:00:00"), "e1"),  # after obs a,b → b
            (1, _ts("2024-01-01 00:00:00"), "e2"),  # equal to obs a → a
            (1, _ts("2023-12-31 23:59:59"), "e3"),  # before all → null
            (2, _ts("2024-06-01 00:00:00"), "e4"),  # no obs for key → null
        ],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 10.0),  # a
            (1, _ts("2024-01-02 00:00:00"), 20.0),  # b
            (1, _ts("2024-01-03 00:00:00"), 30.0),  # future — never matches
        ],
        "k bigint, ots timestamp, v double",
    )
    out = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ots", value_cols=["v"]
        ).collect()
    }
    assert out == {"e1": 20.0, "e2": 10.0, "e3": None, "e4": None}


def test_range_join_half_open_interval(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00")), (1, _ts("2024-01-05 00:00:00")),
         (1, _ts("2024-01-10 00:00:00"))],
        "k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 00:00:00"), _ts("2024-01-10 00:00:00"))],
        "k bigint, wid int, s timestamp, e timestamp",
    )
    got = range_join(left, right, key="k", ts="ts", start="s", end="e").collect()
    # start inclusive, end exclusive → 2 of the 3 events
    assert len(got) == 2


def test_range_join_is_keyed_not_cross(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-02 00:00:00")), (2, _ts("2024-01-02 00:00:00"))],
        "k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"))],
        "k bigint, wid int, s timestamp, e timestamp",
    )
    got = range_join(left, right, key="k", ts="ts", start="s", end="e").collect()
    assert len(got) == 1 and got[0]["k"] == 1


def test_asof_join_keeps_matched_rows_nulls_and_never_tears_rows(spark):
    """Review r5: the matched right ROW travels atomically — a NULL in
    the matched row must stay NULL (not fill from an older row), and
    multi-column fills must never mix two right rows."""
    from tfl_bikes_data_pipeline_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, "2024-01-01", 1.0, None), (1, "2024-01-02", None, 2.0)],
        "k long, ots string, x double, y double",
    ).selectExpr("k", "CAST(ots AS TIMESTAMP) AS ots", "x", "y")
    left = spark.createDataFrame(
        [(1, "2024-01-03")], "k long, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    row = asof_join(left, right, "k", "ts", "ots", ["x", "y"]).first()
    assert row.x is None and row.y == 2.0, (row.x, row.y)


def test_asof_join_ignores_null_ts_and_null_key_right_rows(spark):
    """A NULL-timestamp observation must never fill forward, and NULL
    keys must not equi-match (SQL NULL semantics, like the oracle)."""
    from tfl_bikes_data_pipeline_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, None, 99.0), (None, "2024-01-01", 55.0)],
        "k long, ots string, v double",
    ).selectExpr("k", "CAST(ots AS TIMESTAMP) AS ots", "v")
    left = spark.createDataFrame(
        [(1, "2024-01-02"), (None, "2024-01-02")], "k long, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    out = {r.k: r.v for r in asof_join(left, right, "k", "ts", "ots", ["v"]).collect()}
    assert out[1] is None, "NULL-ts observation leaked into the fill"
    assert out[None] is None, "NULL key must not match NULL key"


def test_range_join_full_outer_keeps_right_key_and_self_lineage(spark):
    """how='full' must keep the interval key of unmatched right rows
    (coalesced), and left/right derived from the SAME DataFrame must
    not trip AMBIGUOUS_SELF_JOIN."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.asof import range_join

    base = spark.createDataFrame(
        [(1, "2024-01-05"), (2, "2024-02-05")], "k long, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    windows = base.groupBy("k").agg(
        F.expr("CAST('2024-01-01' AS TIMESTAMP)").alias("start"),
        F.expr("CAST('2024-01-31' AS TIMESTAMP)").alias("end"),
    ).where(F.col("k") == 9)  # interval for a key with no left rows
    windows = windows.unionByName(
        spark.createDataFrame(
            [(9, "2024-01-01", "2024-01-31")], "k long, start string, end string"
        ).selectExpr(
            "k", "CAST(start AS TIMESTAMP) AS start", "CAST(end AS TIMESTAMP) AS end"
        )
    )
    out = range_join(base, windows, "k", "ts", "start", "end", how="full")
    ks = {r.k for r in out.collect()}
    assert 9 in ks, "unmatched right interval lost its key under how='full'"
