"""Empirical scaling evidence for the blocked dedup/ANN/decontaminate
paths (VERDICT r3 item 4): generate corpus-scaled fixtures at m× the
sf0.1 documents/embeddings tables, run the blocked queries at each
scale, and print a wall-time growth table (recorded in PLANS.md).

Fixture construction holds the DUPLICATE RATE constant while rows grow
m× — the property that makes the measurement meaningful:

- documents: copy i remaps every token with a ``~i`` suffix, so
  intra-copy similarity structure is identical to the original corpus
  while cross-copy similarity is zero. Near-dup pair count therefore
  grows linearly in m (a naive replication would make every doc a
  10-way duplicate and measure an m² pair explosion instead of the
  engine).
- embeddings: copy i sign-flips a copy-specific pseudo-random half of
  the dimensions — norms and intra-copy cosine structure are preserved
  exactly; cross-copy cosines concentrate near 0.

Usage: python tools/scaling_bench.py [--scales 1,4,10] [--repeat 2]
Writes fixtures under a temp dir (removed on exit unless --keep).
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

from pyspark.sql import SparkSession, functions as F

from tfl_bikes_data_pipeline_spark import registry
from tfl_bikes_data_pipeline_spark.session import get_spark
from tfl_bikes_data_pipeline_spark.tables import load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "q_dedup_minhash_lsh",
    "q_dedup_embedding",
    "q_decontaminate",
    "q_ann_ivf_topk",
]


def build_fixture(spark: SparkSession, out_dir: str, m: int) -> None:
    docs = load_table(spark, BASE, "documents")
    embs = load_table(spark, BASE, "embeddings")
    n_docs = docs.count()
    n_vecs = embs.count()

    doc_copies = []
    for i in range(m):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        if i > 0:
            c = c.withColumn("text", F.regexp_replace("text", r"(\S+)", f"$1~{i}"))
        doc_copies.append(c)
    all_docs = doc_copies[0]
    for c in doc_copies[1:]:
        all_docs = all_docs.unionByName(c)
    all_docs.coalesce(max(4, m)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb_copies = []
    for i in range(m):
        c = embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_vecs))
        if i > 0:
            flip = (
                "transform(embedding, (x, d) -> "
                f"CASE WHEN (d * 37 + {i} * 53) % 97 < 48 THEN -x ELSE x END)"
            )
            c = c.withColumn("embedding", F.expr(flip).cast("array<float>"))
        emb_copies.append(c)
    all_embs = emb_copies[0]
    for c in emb_copies[1:]:
        all_embs = all_embs.unionByName(c)
    all_embs.coalesce(max(4, m)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    # events: copy i shifts ids and introduces a FRESH user population
    # (user_id offset), so per-user session/series structure is
    # identical per copy and total work grows linearly in m — naive
    # replication would instead deepen every user's history m× and
    # measure per-user state growth, a different (and unrepresentative)
    # axis.
    events = load_table(spark, BASE, "events")
    # max+1 offsets for BOTH ids: count() would collide copies if ids
    # were ever sparse / non-zero-based
    n_events = events.agg(F.max("event_id")).first()[0] + 1
    n_users = events.agg(F.max("user_id")).first()[0] + 1
    ev_copies = []
    for i in range(m):
        c = events.withColumn(
            "event_id", F.col("event_id") + F.lit(i * n_events)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
        ev_copies.append(c)
    all_ev = ev_copies[0]
    for c in ev_copies[1:]:
        all_ev = all_ev.unionByName(c)
    all_ev.coalesce(max(4, m)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    # part: copy i suffixes every p_name token with ~i (same trick as
    # documents) — intra-copy name-collision/Levenshtein structure is
    # identical to the original, cross-copy names land in disjoint
    # blocks (the blocking key is the first token), so entity-cluster
    # count grows linearly in m rather than every name becoming an
    # m-way duplicate.
    part = load_table(spark, BASE, "part")
    n_part = part.agg(F.max("p_partkey")).first()[0] + 1
    part_copies = []
    for i in range(m):
        c = part.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * n_part))
        if i > 0:
            c = c.withColumn("p_name", F.regexp_replace("p_name", r"(\S+)", f"$1~{i}"))
        part_copies.append(c)
    all_part = part_copies[0]
    for c in part_copies[1:]:
        all_part = all_part.unionByName(c)
    all_part.coalesce(max(4, m)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "part.parquet")
    )

    # full-star replication for the decision-support joins: each copy
    # offsets every key (orderkey/custkey/suppkey/partkey) by copy ×
    # (max+1), so joins resolve strictly within-copy and join
    # cardinalities grow linearly in m — the property that makes a
    # fact-join scaling number mean "more data", not "denser joins".
    copies = {}
    for tbl, keys in (
        ("customer", ["c_custkey"]),
        ("supplier", ["s_suppkey"]),
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ):
        base_df = load_table(spark, BASE, tbl)
        copies[tbl] = (base_df, {})
    # key offsets must be CONSISTENT across tables (o_custkey offsets by
    # customer's max, l_partkey by part's max, ...)
    key_base = {
        "c_custkey": copies["customer"][0].agg(F.max("c_custkey")).first()[0] + 1,
        "s_suppkey": copies["supplier"][0].agg(F.max("s_suppkey")).first()[0] + 1,
        "o_orderkey": copies["orders"][0].agg(F.max("o_orderkey")).first()[0] + 1,
        "p_partkey": n_part,
    }
    key_base.update(
        {
            "o_custkey": key_base["c_custkey"],
            "l_orderkey": key_base["o_orderkey"],
            "l_partkey": key_base["p_partkey"],
            "l_suppkey": key_base["s_suppkey"],
        }
    )
    for tbl, keys in (
        ("customer", ["c_custkey"]),
        ("supplier", ["s_suppkey"]),
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ):
        base_df = copies[tbl][0]
        parts = []
        for i in range(m):
            c = base_df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * key_base[k]))
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        out.coalesce(max(4, m)).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{tbl}.parquet")
        )

    # remaining tables (dims etc.) ride along unscaled — queries under
    # scaling measurement only grow on the replicated corpus tables,
    # and a missing table would fail unrelated relations they join.
    from tfl_bikes_data_pipeline_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        src = os.path.join(BASE, f"{t}.parquet")
        if not os.path.exists(dst) and os.path.exists(src):
            os.symlink(src, dst)


def run_once(spark: SparkSession, sf_dir: str, name: str) -> float:
    fn = registry.QUERIES[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,10")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    queries = args.queries.split(",")

    spark = get_spark(app_name="scaling-bench")
    spark.range(1000).count()

    # warm-up pass: run every query once at base scale so codegen /
    # broadcast / shuffle-service warm-up doesn't land in the first
    # measured cell.
    for q in queries:
        run_once(spark, BASE, q)

    root = tempfile.mkdtemp(prefix="scalefix_")
    results: dict[str, dict[int, float]] = {q: {} for q in queries}
    try:
        for m in scales:
            if m == 1:
                sf_dir = BASE
            else:
                sf_dir = os.path.join(root, f"x{m}")
                os.makedirs(sf_dir, exist_ok=True)
                build_fixture(spark, sf_dir, m)
            for q in queries:
                best = min(run_once(spark, sf_dir, q) for _ in range(args.repeat))
                results[q][m] = round(best, 3)
                print(f"  {q} @ {m}x: {results[q][m]}s", file=sys.stderr)
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)

    out = {"base": BASE, "scales": scales, "times": results, "ratios": {}}
    lo, hi = scales[0], scales[-1]
    for q in queries:
        out["ratios"][q] = round(results[q][hi] / results[q][lo], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
