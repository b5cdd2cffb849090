"""Compare two bench artifacts query-by-query.

Accepts any mix of BENCH_r{N}.json (driver stdout line; flat
``queries`` map of cold timings pre-r6, the driver-pinned subset only)
and BENCH_DETAIL.md (full per-query map; {cold, steady} split from
round 6). Prints the common-subset totals, the per-query deltas beyond
a threshold, and — when both sides carry a steady column — the
steady-vs-steady comparison, which is the one that means anything
across sessions (cold timings are codegen- and contention-loaded; see
PLANS.md round-5 postmortem).

Usage:
  python tools/bench_compare.py BENCH_r05.json BENCH_DETAIL.md
  python tools/bench_compare.py BENCH_r05.json BENCH_r06.json --threshold 0.5
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[str, dict[str, float]]:
    """name -> {"cold": x} or {"cold": x, "steady": y}."""
    text = open(path).read()
    if "```json" in text:
        doc = json.loads(text.split("```json\n")[1].split("\n```")[0])
    else:
        try:
            doc = json.loads(text)  # driver artifact: one pretty-printed object
        except json.JSONDecodeError:
            doc = json.loads(text.strip().splitlines()[-1])  # raw stdout capture
        if "queries" not in doc and "tail" in doc:
            # driver wrapper: our stdout line is embedded in the
            # captured tail and may be head-truncated (2000-char
            # budget) — recover the per-query pairs by regex instead
            # of whole-object parsing
            import re

            pairs = re.findall(r'"([pq]_\w+)"\s*:\s*([0-9.]+)', doc["tail"])
            doc = {"queries": {n: float(v) for n, v in pairs}}
    out = {}
    for name, t in doc["queries"].items():
        out[name] = dict(t) if isinstance(t, dict) else {"cold": float(t)}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="report per-query deltas larger than this (sec)")
    args = ap.parse_args()
    a, b = load(args.old), load(args.new)
    common = sorted(set(a) & set(b))
    if not common:
        sys.exit("no common queries between the two artifacts")

    for col in ("cold", "steady"):
        if not all(col in a[n] for n in common) or not all(col in b[n] for n in common):
            if col == "steady":
                print("(steady column absent on one side — cold-only compare)")
            continue
        ta = sum(a[n][col] for n in common)
        tb = sum(b[n][col] for n in common)
        print(
            f"{col}: {len(common)} common queries, "
            f"{ta:.1f}s -> {tb:.1f}s ({(tb / ta - 1) * 100:+.1f}%)"
        )
        moved = sorted(
            ((n, a[n][col], b[n][col]) for n in common
             if abs(b[n][col] - a[n][col]) >= args.threshold),
            key=lambda r: -(abs(r[2] - r[1])),
        )
        for n, va, vb in moved:
            print(f"  {n:32s} {va:7.2f} -> {vb:7.2f}  ({vb - va:+.2f})")
    only_new = sorted(set(b) - set(a))
    if only_new:
        print(f"new-only queries ({len(only_new)}): {' '.join(only_new)}")


if __name__ == "__main__":
    main()
