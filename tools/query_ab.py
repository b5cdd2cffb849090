"""Matched-conditions interleaved A/B for ONE registry query between
two checkouts of this repo (the per-query arbiter of PLANS.md "Round
10": artifact-level movers of 1.2-1.7x on untouched code typically
measure 0.85-1.10 under matched conditions — host drift, not engine
drift).

Protocol: the ref commit is materialized as a git worktree; the two
trees then run as ALTERNATING fresh-session subprocesses (ref, cur,
ref, cur, ...) so slow host drift averages out of the comparison.
Each subprocess session: session warm-up (range + fixture table
counts), one cold run (plan build + codegen), then --steady-runs
repeats of the same plan; the session reports cold and best-of-N
steady. The headline is best-over-reps steady per side and their
ratio.

Usage:
  python tools/query_ab.py --query q_dedup_embedding_clusters \
      --ref-commit 8c8ee2f [--sf-dir /root/testdata/sf0.1] \
      [--reps 3] [--steady-runs 3]

Prints one JSON line; paste the table into PLANS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: subprocess body: one fresh-session measurement of one query.
#: argv: <repo_root> <query> <sf_dir> <steady_runs>
_SESSION_BODY = r"""
import json, sys, time
root, name, sf_dir, steady_runs = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
sys.path.insert(0, root)
from tfl_bikes_data_pipeline_spark import registry
from tfl_bikes_data_pipeline_spark.session import get_spark
from tfl_bikes_data_pipeline_spark.tables import TABLE_NAMES, load_table

spark = get_spark(app_name="query_ab")
spark.range(1000).count()
for t in TABLE_NAMES:
    load_table(spark, sf_dir, t).count()

fn = registry.QUERIES[name]

def once() -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

cold = once()
steady = [once() for _ in range(steady_runs)]
print(json.dumps({"cold": cold, "steady_best": min(steady), "steady_all": steady}))
spark.stop()
"""


def _run_session(tree: str, query: str, sf_dir: str, steady_runs: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _SESSION_BODY, tree, query, sf_dir, str(steady_runs)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"session failed in {tree}:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--ref-commit", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--steady-runs", type=int, default=3)
    args = ap.parse_args()

    # branch-style refs (origin/main) contain '/', which would make
    # mkdtemp target a nonexistent parent dir — sanitize for the prefix
    safe_ref = re.sub(r"[^\w.-]", "_", args.ref_commit)
    wt = tempfile.mkdtemp(prefix=f"ab_{safe_ref}_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, args.ref_commit],
        check=True,
        capture_output=True,
    )
    try:
        reps = []
        for i in range(args.reps):
            row = {}
            for side, tree in (("ref", wt), ("cur", REPO)):
                r = _run_session(tree, args.query, args.sf_dir, args.steady_runs)
                row[side] = r
                print(
                    f"rep {i + 1} {side}: cold={r['cold']} "
                    f"steady_best={r['steady_best']} ({r['steady_all']})",
                    file=sys.stderr,
                )
            reps.append(row)
        best = {
            side: min(r[side]["steady_best"] for r in reps)
            for side in ("ref", "cur")
        }
        out = {
            "query": args.query,
            "ref_commit": args.ref_commit,
            "sf_dir": args.sf_dir,
            "reps": reps,
            "steady_best": best,
            "ratio_cur_over_ref": round(best["cur"] / best["ref"], 3)
            if best["ref"] > 0
            else None,
        }
        print(json.dumps(out))
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )


if __name__ == "__main__":
    main()
