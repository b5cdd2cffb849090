"""Assignment-cost scaling: flat O(n·k) vs two-level O(n·√k) vs
three-level O(n·k^(1/3)) centroid assignment, measured in isolation
(VERDICT r4 item 6; r8 item 6 added the three-level declared path).

The embedding near-dup's verify stage is linear by construction (the
corpus-scaled centroid count pins bucket population); the ASSIGNMENT
stage is the term whose asymptotics differ between the flat scorer and
the hierarchical coarse→fine quantizer. Centroid scoring is separable
from the rest of the plan, so this harness times ONLY the assignment
relation (materialized to a noop sink) over synthetic corpora of
fixture-shaped 64-dim vectors, with the production k = n/50 rule.

Vectors are deterministic (seeded off vec_id via Spark expressions —
no fixture I/O, no Python RNG), so runs are reproducible and the two
modes score the identical corpus.

Usage: python tools/assign_scaling.py [--flat-max 100000]
           [--scales 25000,50000,100000,250000,1000000]
Prints one JSON line; table recorded in PLANS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from tfl_bikes_data_pipeline_spark.functions.vectors import norm_expr
from tfl_bikes_data_pipeline_spark.operators.dedup import (
    EMBED_PROBE_NPROBE,
    _flat_multi_assign,
    _three_level_multi_assign,
    _two_level_multi_assign,
    embed_block_num_centroids,
)
from tfl_bikes_data_pipeline_spark.session import get_spark

DIM = 64


def synthetic_corpus(spark, n: int) -> DataFrame:
    """n deterministic 64-dim vectors: pseudo-random but fully seeded
    by (vec_id, dim) so both assign modes score the same corpus."""
    mix = (
        f"transform(sequence(0, {DIM - 1}), d -> "
        "CAST(((id * 2654435761 + d * 40503) % 10007) - 5003 AS DOUBLE) / 5003.0)"
    )
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), F.expr(mix).alias("cv"))
        .withColumn("nv", F.expr(norm_expr("cv")))
    )


def time_assign(spark, n: int, mode: str) -> float:
    e = synthetic_corpus(spark, n)
    k = embed_block_num_centroids(n)
    centroids = e.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("cv").alias("qv"),
        F.col("nv").alias("nq"),
    )
    if mode == "flat":
        assign = _flat_multi_assign(e, centroids, EMBED_PROBE_NPROBE)
    elif mode == "two_level":
        # hierarchical modes carry (cv, nv) for their callers; project
        # down to the id pairs so all modes materialize the same volume.
        assign = _two_level_multi_assign(e, centroids, k, EMBED_PROBE_NPROBE).select(
            "vec_id", "centroid_id"
        )
    else:
        assign = _three_level_multi_assign(e, centroids, k, EMBED_PROBE_NPROBE).select(
            "vec_id", "centroid_id"
        )
    t0 = time.perf_counter()
    assign.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="25000,50000,100000,250000,1000000")
    ap.add_argument("--flat-max", type=int, default=100_000)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = get_spark(app_name="assign-scaling")
    spark.range(1000).count()
    # warm codegen for both shapes at the smallest scale
    time_assign(spark, scales[0], "flat")
    time_assign(spark, scales[0], "two_level")
    time_assign(spark, scales[0], "three_level")

    out: dict[str, dict[int, float]] = {"flat": {}, "two_level": {}, "three_level": {}}
    for n in scales:
        for mode in ("flat", "two_level", "three_level"):
            if mode == "flat" and n > args.flat_max:
                continue  # the point of the harness: flat stops scaling
            best = min(time_assign(spark, n, mode) for _ in range(args.repeat))
            out[mode][n] = round(best, 2)
            print(f"  {mode} @ n={n}: {out[mode][n]}s", file=sys.stderr)
    print(json.dumps({"dim": DIM, "nprobe": EMBED_PROBE_NPROBE, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
