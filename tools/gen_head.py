"""Print the recommended next-round REGISTRY_HEAD, staleness-ordered.

Since r12 the head pins by FRESHNESS (verdict r11 task 2): new
never-driver-checked hash-oracled queries first (the introduction-round
pin invariant), then every remaining hash-oracled query ordered by the
round of its most recent green row across ALL committed
CORRECTNESS_r{N}.json artifacts, oldest first. This tool recomputes
that ordering from the artifacts so each round's rotation is one
command plus a paste into registry.REGISTRY_HEAD (names only — keep
the comment structure by hand).

Bound-oracle queries (registry.BOUND_ORACLES) are excluded: the driver
hash compare cannot pin them; their error contracts ride the
hash-oracled q_approx_*_gate twins.

Usage: python tools/gen_head.py [--size N]   (default: len(REGISTRY_HEAD))
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfl_bikes_data_pipeline_spark import registry


def last_green_rounds(repo: str) -> dict[str, int]:
    """query -> round of its most recent green driver row."""
    last: dict[str, int] = {}
    arts = []
    for fn in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if m:
            arts.append((int(m.group(1)), os.path.join(repo, fn)))
    for rnd, path in sorted(arts):
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if ok:
                last[name] = rnd
    return last


def ordering(repo: str) -> list[str]:
    """The full staleness ordering over the live registry (never-checked
    first, then oldest-green first; ties keep registry order). The
    committed REGISTRY_HEAD must be a prefix of this list —
    tests/test_registry_contract.py enforces it (verdict r12 task 2)."""
    last = last_green_rounds(repo)
    hash_oracled = [q for q in registry.QUERIES if q in registry.ORACLES]
    never = [q for q in hash_oracled if q not in last]
    stale = sorted((q for q in hash_oracled if q in last), key=lambda q: last[q])
    return never + stale


def main() -> None:
    ap = argparse.ArgumentParser()
    # default: the committed head's length, so a naive regeneration
    # round-trips exactly (ADVICE r12: a fixed 57 vs the 58-entry
    # committed head silently dropped the last name).
    ap.add_argument(
        "--size",
        type=int,
        default=len(registry.REGISTRY_HEAD),
        help="names to emit (default: len(REGISTRY_HEAD))",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last = last_green_rounds(repo)
    head = ordering(repo)[: args.size]
    n_never = sum(1 for q in head if q not in last)
    print(f"# {n_never} never-driver-checked (pin first), then by last-green round")
    for q in head:
        print(f'    "{q}",  # {"NEW" if q not in last else f"r{last[q]:02d}"}')


if __name__ == "__main__":
    main()
