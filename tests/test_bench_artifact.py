"""The bench artifact contract — round 2 shipped with NO benchmark
number because bench.py crashed partway (rc=1, stack trace instead of
JSON). This test runs the real harness end-to-end at the smoke scale
and validates everything the driver consumes, so a query that breaks
the bench breaks the suite first."""

import json
import os
import subprocess
import sys


def test_bench_runs_to_completion_and_emits_contract_json():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    assert proc.returncode == 0, f"bench crashed:\n{proc.stderr[-2000:]}"

    # the driver takes the LAST stdout line as the artifact
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    assert out["value"] > 0
    assert out["queries"], "no per-query timings"
    assert all(t >= 0 for t in out["queries"].values())
    # the headline set must cover every BENCH-declared query
    from tfl_bikes_data_pipeline_spark import registry

    assert set(out["queries"]) == set(registry.BENCH_QUERIES)
    assert abs(out["value"] - sum(out["queries"].values())) < 0.01
