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
