"""Measure the degree-ordered vs id-ordered triangle-count crossover
(VERDICT r5 item 6).

The declared q_graph_triangles plan pays ~1.2 s of constant overhead
(a degree aggregate + two linear attach joins) for the O(√m) out-degree
bound. This tool quantifies the trade empirically on the real near-dup
graph at corpus scales 1×..20× (constant-duplicate-rate replication via
tools/scaling_bench.build_fixture): wall time for both orderings, the
identical triangle counts (a correctness cross-check of the id-ordered
variant), the wedge counts actually examined, and the degree profile
(max degree, Σdeg², edges) that determines where each ordering's wedge
work lands. Results go in PLANS.md.

Usage: python tools/triangle_crossover.py [--scales 1,4,10,20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.operators.dedup import _lsh_pairs_unordered
from tfl_bikes_data_pipeline_spark.operators.graph import triangle_count
from tfl_bikes_data_pipeline_spark.session import get_spark
from tools.scaling_bench import BASE, build_fixture


def measure(spark, sf_dir: str) -> dict:
    row = {}
    for ordering in ("degree", "id"):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            res = triangle_count(
                _lsh_pairs_unordered(spark, sf_dir), ordering=ordering
            ).collect()[0]
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        row[ordering] = {
            "sec": round(best, 3),
            "n_triangles": res["n_triangles"],
            "n_edges": res["n_edges"],
            "n_wedges": res["n_wedges"],
        }
    pairs = _lsh_pairs_unordered(spark, sf_dir)
    e = pairs.select(
        F.least("doc_a", "doc_b").alias("lo"), F.greatest("doc_a", "doc_b").alias("hi")
    ).distinct()
    sym = e.select(F.col("lo").alias("node")).unionAll(e.select(F.col("hi").alias("node")))
    prof = (
        sym.groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.max("d").alias("max_deg"),
            F.sum(F.col("d") * F.col("d")).alias("sum_deg2"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
        .first()
    )
    row["degree_profile"] = {
        "max_deg": prof["max_deg"],
        "sum_deg2": prof["sum_deg2"],
        "n_nodes": prof["n_nodes"],
    }
    assert row["degree"]["n_triangles"] == row["id"]["n_triangles"], row
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,10,20")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = get_spark(app_name="triangle-crossover")
    spark.range(1000).count()
    # warm both orderings' codegen before the first measured cell
    for ordering in ("degree", "id"):
        triangle_count(_lsh_pairs_unordered(spark, BASE), ordering=ordering).collect()

    root = tempfile.mkdtemp(prefix="trifix_")
    out: dict[str, dict] = {}
    try:
        for m in scales:
            if m == 1:
                sf_dir = BASE
            else:
                sf_dir = os.path.join(root, f"x{m}")
                os.makedirs(sf_dir, exist_ok=True)
                build_fixture(spark, sf_dir, m)
            out[str(m)] = measure(spark, sf_dir)
            print(f"  x{m}: {json.dumps(out[str(m)])}", file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({"base": BASE, "scales": scales, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
