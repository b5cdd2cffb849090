"""Profile the two slowest stateful streaming drains (VERDICT r6 item
6): split plan-fixed cost vs state-store cost for
q_stream_stateful_counts and q_stream_join by A/B-ing

- state-store provider: default HDFSBacked (heap) vs RocksDB, at 1x
  and 4x events;
- micro-batch sizing: the stateful-counts drain staged as 1 / 3 / 6
  landing files under maxFilesPerTrigger=1 (1 file = plan cost + a
  single state pass; the per-extra-file delta is the marginal
  batch+state cost).

Events-only 4x replica: copy i shifts event_id/user_id so each copy is
a FRESH user population (total work grows linearly in m; per-user state
depth unchanged — the same axis tools/scaling_bench.py replicates).

Usage: python tools/stream_state_profile.py   # prints one JSON line
       python tools/stream_state_profile.py --dedup-sinks [--m 100]
         # sink-vs-state split for the dedup family (r8 verdict item
         # 7): q_stream_dedup (aggregation INSIDE the stream — state
         # cost only, sink O(5 rows)) vs q_stream_dedup_warehouse
         # (same dedup state + row-level foreachBatch parquet sink) at
         # 1x and mx events. Their delta isolates what shipping the
         # surviving row volume through a production sink costs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from tfl_bikes_data_pipeline_spark.session import get_spark
from tfl_bikes_data_pipeline_spark.tables import load_table
from tfl_bikes_data_pipeline_spark.streaming import jobs, stateful

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = 2


def replicate_events(spark: SparkSession, out_dir: str, m: int) -> None:
    events = load_table(spark, BASE, "events")
    n_events = events.agg(F.max("event_id")).first()[0] + 1
    n_users = events.agg(F.max("user_id")).first()[0] + 1
    copies = [
        events.withColumn("event_id", F.col("event_id") + F.lit(i * n_events))
        .withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
        for i in range(m)
    ]
    all_ev = copies[0]
    for c in copies[1:]:
        all_ev = all_ev.unionByName(c)
    all_ev.coalesce(max(4, m)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def time_stateful_counts(spark: SparkSession, sf_dir: str, n_files: int) -> float:
    # Stage the landing dir ONCE, outside the timed region: the staging
    # repartition(n_files)+write of the whole events table itself varies
    # with n_files and would contaminate the per-extra-file delta this
    # tool claims isolates (marginal batch+state cost only).
    landing = stateful.stage_landing_dir_split(spark, sf_dir, n_files)
    best = float("inf")
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema(stateful.EVENTS_MICRO_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        counts = stateful.cumulative_user_counts(stream)
        out = jobs.run_available_now(counts, spark, output_mode="update")
        out.groupBy("user_id").agg(F.max("n_events")).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def time_stream_join(spark: SparkSession, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        jobs.q_stream_join(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def time_query(spark: SparkSession, sf_dir: str, name: str) -> float:
    fn = {**jobs.QUERIES, **stateful.QUERIES}[name]
    best = float("inf")
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def sink_pair_main(m: int, base_name: str, twin_name: str, tag: str) -> None:
    """Sink-vs-state split for any (memory-sink form, parquet-warehouse
    twin) pair at 1x and mx events, same session: their delta isolates
    what shipping the emission volume through a production sink costs
    on top of the state-store work both forms share."""
    spark = get_spark(app_name=f"stream-{tag}-sinks")
    spark.range(1000).count()
    root = tempfile.mkdtemp(prefix=f"{tag}sink_")
    xm = os.path.join(root, f"x{m}")
    os.makedirs(xm, exist_ok=True)
    replicate_events(spark, xm, m)

    results: dict = {"m": m, "queries": {}}
    for name in (base_name, twin_name):
        time_query(spark, BASE, name)  # warm-up
        t1 = time_query(spark, BASE, name)
        tm = time_query(spark, xm, name)
        results["queries"][name] = {
            "1x": t1,
            f"{m}x": tm,
            "ratio": round(tm / t1, 2),
        }
        print(f"  {name}: 1x={t1}s {m}x={tm}s", file=sys.stderr)
    d1 = results["queries"][twin_name]["1x"] - results["queries"][base_name]["1x"]
    dm = results["queries"][twin_name][f"{m}x"] - results["queries"][base_name][f"{m}x"]
    results["sink_cost_delta"] = {"1x": round(d1, 3), f"{m}x": round(dm, 3)}
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


def dedup_sinks_main(m: int) -> None:
    """Sink-vs-state split: the stream-side-aggregated dedup profile vs
    its production-parquet-sink twin, 1x and mx events, same session."""
    sink_pair_main(m, "q_stream_dedup", "q_stream_dedup_warehouse", "dedup")


def stateful_sinks_main(m: int) -> None:
    """Same split for the applyInPandasWithState bucketed counter (r9
    verdict task 7): its update-mode emission volume is |seen users|
    per micro-batch — a much heavier sink payload per batch than the
    dedup path's surviving-row stream, so the parquet-twin delta prices
    exactly the cost a production deployment pays to persist running
    state snapshots."""
    sink_pair_main(
        m,
        "q_stream_stateful_counts",
        "q_stream_stateful_counts_warehouse",
        "stateful",
    )


def main() -> None:
    spark = get_spark(app_name="stream-state-profile")
    spark.range(1000).count()
    root = tempfile.mkdtemp(prefix="streamprof_")
    x4 = os.path.join(root, "x4")
    os.makedirs(x4, exist_ok=True)
    replicate_events(spark, x4, 4)

    results: dict = {"batch_sizing": {}, "provider": {}}
    # warm-up
    time_stateful_counts(spark, BASE, 3)
    time_stream_join(spark, BASE)

    for n_files in (1, 3, 6):
        results["batch_sizing"][f"stateful_counts_{n_files}f"] = (
            time_stateful_counts(spark, BASE, n_files)
        )
        print(f"  batch sizing {n_files} files: "
              f"{results['batch_sizing'][f'stateful_counts_{n_files}f']}s",
              file=sys.stderr)

    for scale, sf_dir in (("1x", BASE), ("4x", x4)):
        for provider in ("default", "rocksdb"):
            if provider == "rocksdb":
                ctx = jobs.rocksdb_state(spark)
            else:
                import contextlib

                ctx = contextlib.nullcontext()
            with ctx:
                sc = time_stateful_counts(spark, sf_dir, 3)
                sj = time_stream_join(spark, sf_dir)
            results["provider"][f"stateful_counts_{scale}_{provider}"] = sc
            results["provider"][f"stream_join_{scale}_{provider}"] = sj
            print(f"  {scale} {provider}: counts={sc}s join={sj}s",
                  file=sys.stderr)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    if "--dedup-sinks" in sys.argv or "--stateful-sinks" in sys.argv:
        import argparse

        ap = argparse.ArgumentParser()
        ap.add_argument("--dedup-sinks", action="store_true")
        ap.add_argument("--stateful-sinks", action="store_true")
        ap.add_argument("--m", type=int, default=100)
        args = ap.parse_args()
        if args.m < 2:
            ap.error("--m must be >= 2 (1x is always measured as the base)")
        if args.dedup_sinks:
            dedup_sinks_main(args.m)
        if args.stateful_sinks:
            stateful_sinks_main(args.m)
    else:
        main()
