"""Broadcast-hint policy as a machine-checked plan lint.

Policy (PLANS.md "Broadcast-hint policy", set by two measured
incidents — ``q_dq_audit`` broadcast the orders key set and ran 15.5×
at a 10× replica; ``q_bloom_filter_probe`` repeated the pattern with
the customer key set): a ``F.broadcast`` / ``hint("broadcast")`` is
legal ONLY when the hinted relation's cardinality is bounded by
construction, never by fixture luck. Bounded means one of:

* it reads no SF-grown base table at all (fixed dims like nation and
  region, ``LocalRelation`` algorithm state such as collected
  centroids/codebooks, inline ranges);
* every path from the hint down to an SF-grown scan passes a GLOBAL
  aggregate (no grouping keys → exactly one row);
* every such path passes a plan-level ``limit(n)`` — the idiom for
  "grouped aggregate with a structurally bounded key domain" (e.g. a
  bloom sketch grouped on ``pos/64 < 256``): the author declares the
  bound with ``.limit(bound)`` right where the proof lives, the limit
  is a no-op at runtime (the bound holds by construction), and the
  broadcast can never exceed ``bound`` rows even if the proof rots.

Everything else — key sets, semi-join outputs, grouped aggregates on
data-cardinality keys — must go unhinted and let AQE decide from
measured sizes (it still picks BHJ at fixture scale; at 100 TB it
correctly won't).

The walk runs on the ANALYZED logical plan, where every explicit hint
survives as a ``ResolvedHint`` node. This deliberately ignores
broadcasts the optimizer chooses on its own (size-statistics BHJ):
those re-derive per run and are exactly what the policy delegates to
AQE. Only the hints we hard-code can hurt at scale, so only they are
linted.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: base tables whose row count grows with the scale factor — a forced
#: broadcast of anything cardinality-tied to these is a scale incident
#: waiting to happen. nation/region are fixed-size by the data model
#: and deliberately absent.
SF_GROWN_TABLES = (
    "customer",
    "supplier",
    "part",
    "partsupp",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: logical nodes that cap the row count of everything above them:
#: GlobalLimit/LocalLimit from ``df.limit(n)`` (and Sort+Limit top-k).
_LIMIT_NODES = ("GlobalLimit", "LocalLimit")

_TABLE_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\.(?:parquet|csv)")


def _children(node) -> list:
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _leaf_tables(node) -> set:
    """SF-grown table names scanned by a leaf relation node, matched on
    the scan's root file paths (the engine loads every base table from
    ``<sf_dir>/<table>.parquet``). Non-file leaves (``LocalRelation``
    algorithm state, ``Range``, memory-sink views) scan nothing."""
    try:
        paths = node.relation().location().rootPaths()
        strs = " ".join(paths.apply(i).toString() for i in range(paths.length()))
    except Exception:
        return set()
    found = set()
    for m in _TABLE_RE.finditer(strs):
        if m.group(1) in SF_GROWN_TABLES:
            found.add(m.group(1))
    return found


def _unbounded_sf_tables(node) -> set:
    """SF-grown tables reachable from ``node`` without crossing a
    cardinality-bounding node (global aggregate or plan-level limit)."""
    name = node.getClass().getSimpleName()
    if name in _LIMIT_NODES:
        return set()
    if name == "Aggregate" and node.groupingExpressions().isEmpty():
        return set()  # global aggregate → exactly one row
    kids = _children(node)
    if not kids:
        return _leaf_tables(node)
    out: set = set()
    for child in kids:
        out |= _unbounded_sf_tables(child)
    return out


def broadcast_policy_violations(df: DataFrame) -> list[str]:
    """Every explicit broadcast hint in ``df``'s analyzed plan whose
    build side is unbounded-SF-grown, as human-readable descriptions.
    Empty list = plan complies with the broadcast policy."""
    violations: list[str] = []

    def visit(node) -> None:
        if node.getClass().getSimpleName() == "ResolvedHint":
            strategy = node.hints().toString()
            if "broadcast" in strategy.lower():
                tables = _unbounded_sf_tables(node)
                if tables:
                    violations.append(
                        "broadcast hint over unbounded SF-grown scan(s) "
                        f"{sorted(tables)} — drop the hint (let AQE "
                        "decide) or declare the structural bound with "
                        ".limit(bound)"
                    )
                    return  # children of a flagged hint: same finding
        for child in _children(node):
            visit(child)

    visit(df._jdf.queryExecution().analyzed())
    return violations
