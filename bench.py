"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing is end-to-end per query: plan construction + execution to a
noop-format write action, i.e. full materialization without collecting
rows to the driver.

The driver captures only the LAST ~2000 characters of stdout, so the
emitted line must stay under that budget: `value`/`n` cover ALL bench
queries, while the inline `queries` map is restricted to the
driver-pinned subset (the cross-round comparable set). The complete
per-query map is written to BENCH_DETAIL.md alongside this script.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tfl_bikes_data_pipeline_spark import registry
from tfl_bikes_data_pipeline_spark.session import get_spark

#: the driver tail-captures 2000 chars; leave headroom for the newline.
MAX_LINE = 1900


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    # warm the JVM/session and the table scans (parquet footers, codegen)
    # so the first measured query doesn't absorb one-time session costs.
    spark.range(1000).count()
    from tfl_bikes_data_pipeline_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in registry.BENCH_QUERIES:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    pinned = {n: t for n, t in timings.items() if n in registry.DRIVER_PINNED}

    # best-effort: the stdout artifact is the contract — a read-only
    # checkout must still get its JSON line after the full run.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.md")
    try:
        with open(detail_path, "w") as fh:
            fh.write(
                "# Bench detail (full per-query map)\n\n"
                f"sf={sf} cpus={os.environ.get('SPARK_GRAFT_CPUS', '32')} "
                f"total={total}s over {len(timings)} queries "
                "(stdout line carries the driver-pinned subset only — "
                "2000-char tail-capture budget).\n\n```json\n"
            )
            fh.write(json.dumps({"sf": sf, "total_sec": total, "queries": timings}, indent=1))
            fh.write("\n```\n")
    except OSError as e:
        print(f"warning: could not write {detail_path}: {e}", file=sys.stderr)

    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "n": len(timings),
        "detail": "BENCH_DETAIL.md",
        "queries": pinned,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(payload, separators=(",", ":"))
    # drop longest-name entries until the line fits the tail capture
    names = sorted(pinned, key=len)
    while len(line) > MAX_LINE and names:
        pinned.pop(names.pop())
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
