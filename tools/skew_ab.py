"""Measured A/B for the skew utilities (VERDICT r7 item 5): do the
explicit salted plans (functions/skew.py) beat plain plans on a
genuinely hot key, and when does AQE + partial aggregation alone
suffice? The conclusion lands in PLANS.md as a measured row, not an
untested promise.

Fixture: HOT-row table of N rows where ``hot_frac`` of all rows carry
ONE key and the rest spread uniformly over ``n_cold`` keys — the
worst single-key skew shape. ``uid`` is a high-cardinality salt
source.

Three A/Bs, each timed best-of-``repeat`` (noop sink):

1. group-count: plain ``groupBy(key).count()`` vs
   ``salted_group_count`` — expected: plain wins or ties, because
   hash-aggregate PARTIAL rows (map-side combine) already collapse the
   hot key to one row per task before the shuffle; the salted form
   only matters when per-key state is non-algebraic (collect_set) or
   a downstream repartition re-concentrates the key.
2. large-state group (collect_set of uid): plain vs salted two-stage
   (per-(key,salt) collect_set, then flatten+dedup per key) — the
   shape where stage-1 state actually concentrates.
3. shuffle join to a non-broadcastable side on the hot key:
   plain SMJ (AQE skew-join on) vs ``salted_join`` — AQE's
   OptimizeSkewedJoin already splits oversized partitions, so the
   explicit salt should only win where AQE can't act (e.g. the
   stream-static or bucketed-input cases it refuses to touch).

Usage: python tools/skew_ab.py [--rows 4000000] [--hot-frac 0.9]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tfl_bikes_data_pipeline_spark.functions.skew import (
    salt_col,
    salted_group_count,
    salted_join,
)
from tfl_bikes_data_pipeline_spark.session import get_spark


def hot_table(spark: SparkSession, n_rows: int, hot_frac: float, n_cold: int) -> DataFrame:
    """id-deterministic skewed table: key 0 is hot, uid is unique."""
    cut = int(n_rows * hot_frac)
    return spark.range(n_rows).select(
        F.when(F.col("id") < cut, F.lit(0))
        .otherwise(F.pmod(F.abs(F.hash(F.col("id"), F.lit("k"))), F.lit(n_cold)) + 1)
        .alias("key"),
        F.col("id").alias("uid"),
        F.pmod(F.abs(F.hash(F.col("id"), F.lit("v"))), F.lit(1000)).alias("v"),
    )


def timed(fn, repeat: int = 2) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.9)
    ap.add_argument("--n-cold", type=int, default=10_000)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="skew-ab")
    spark.range(1000).count()
    big = hot_table(spark, args.rows, args.hot_frac, args.n_cold)
    big.count()  # materialize the input scan cost out of the A/B

    out: dict = {"rows": args.rows, "hot_frac": args.hot_frac}

    # 1. algebraic group-count
    out["count_plain"] = timed(lambda: big.groupBy("key").count(), args.repeat)
    out["count_salted"] = timed(
        lambda: salted_group_count(big, "key", "uid"), args.repeat
    )

    # 2. large per-key state: distinct-uid set per key
    def plain_set():
        return big.groupBy("key").agg(
            F.size(F.collect_set("uid")).alias("n_uids")
        )

    def salted_set():
        partial = (
            big.withColumn("__salt", salt_col("uid"))
            .groupBy("key", "__salt")
            .agg(F.collect_set("uid").alias("us"))
        )
        return (
            partial.select("key", F.explode("us").alias("uid"))
            .groupBy("key")
            .agg(F.countDistinct("uid").alias("n_uids"))
        )

    out["set_plain"] = timed(plain_set, args.repeat)
    out["set_salted"] = timed(salted_set, args.repeat)

    # 3. hot-key shuffle join vs salted join, broadcast disabled so the
    # small side (n_cold+1 keys × payload) actually shuffles
    small = spark.range(args.n_cold + 1).select(
        F.col("id").alias("key"), F.sha2(F.col("id").cast("string"), 256).alias("payload")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe_bc = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        out["join_plain_aqe"] = timed(
            lambda: big.join(small, "key").groupBy("key").agg(
                F.count(F.lit(1)).alias("cnt")
            ),
            args.repeat,
        )
        out["join_salted"] = timed(
            lambda: salted_join(big, small, "key", "uid")
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("cnt")),
            args.repeat,
        )
        # same plain join with AQE skew handling OFF — how much AQE buys
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out["join_plain_noskewaqe"] = timed(
            lambda: big.join(small, "key").groupBy("key").agg(
                F.count(F.lit(1)).alias("cnt")
            ),
            args.repeat,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe_bc is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe_bc
            )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
