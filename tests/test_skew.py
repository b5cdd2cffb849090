"""Salting utilities: results must be identical to the unsalted plans."""

from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.functions.skew import (
    salt_col,
    salted_group_count,
    salted_join,
)
from tfl_bikes_data_pipeline_spark.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    plain = lineitem.join(
        part, lineitem.l_partkey == part.p_partkey, "inner"
    ).groupBy("p_name").count()
    salted = salted_join(
        lineitem.withColumnRenamed("l_partkey", "p_partkey"),
        part,
        key="p_partkey",
        salt_from="l_orderkey",
        n_salts=4,
    ).groupBy("p_name").count()
    a = {(r["p_name"], r["count"]) for r in plain.collect()}
    b = {(r["p_name"], r["count"]) for r in salted.collect()}
    assert a == b


def test_salted_group_count_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"], r["count"])
        for r in events.groupBy("event_type").count().collect()
    }
    salted = {
        (r["event_type"], r["cnt"])
        for r in salted_group_count(
            events, "event_type", salt_from="event_id"
        ).collect()
    }
    assert plain == salted


def test_salt_is_deterministic_and_bounded(spark):
    df = spark.range(1000).select(F.col("id"), salt_col("id", 8).alias("s"))
    r1 = df.collect()
    r2 = df.collect()
    assert r1 == r2
    vals = {r["s"] for r in r1}
    assert vals <= set(range(8)) and len(vals) > 1


def test_salted_join_actually_splits_hot_key(spark):
    """The hot key's rows must land in multiple (key, salt) groups."""
    from pyspark.sql import Row

    big = spark.createDataFrame(
        [Row(k=1, uid=i) for i in range(1000)] + [Row(k=2, uid=i) for i in range(5)]
    )
    salts = (
        big.withColumn("s", salt_col("uid", 8))
        .where(F.col("k") == 1)
        .select("s")
        .distinct()
        .count()
    )
    assert salts == 8
