"""Slowly-changing-dimension (type 2) history build.

The reference keeps dimensions current-state-only (its station /
weather dims are overwritten per load — ``spark/transform_load.py``
write stages; our ``warehouse.py`` twin). A warehouse that feeds
training pipelines needs the *history*: "what was this entity's state
when the fact happened" requires validity intervals, not snapshots.

``scd2_collapse`` turns an event log into type-2 history rows: per
key, consecutive runs of the same attribute value collapse into one
row with ``[valid_from, valid_to)`` bounds (``valid_to`` NULL for the
open current row). The classic gaps-and-islands build:

1. change-point flag — ``attr != lag(attr)`` over (key, order);
2. run id — running sum of the flag (same window);
3. collapse — one hash aggregate per (key, run);
4. interval close — ``lead(valid_from)`` over (key, run order).

Scale notes:
- One shuffle on the key; steps 1, 2 and 4 share the same
  partitioning, so Catalyst plans a single Exchange with three Window
  operators and one partial+final aggregate on top — verified in
  ``tests/test_plan_quality.py::test_scd2_single_exchange``.
- Per-key state is a window frame, never collected: skewed entities
  (one user with millions of events) stream through the sort rather
  than materializing a per-key array.
- The order column must be unique per key ((ts, event_id) here) or
  run boundaries are nondeterministic under shuffle — same rule as
  every ranked query in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table


def scd2_collapse(
    df: DataFrame, key: str, attr: str, order: list[str]
) -> DataFrame:
    """Collapse an event log into SCD-2 validity intervals.

    Returns one row per (key, run of identical ``attr``):
    ``key, attr, valid_from, valid_to, n_events`` where ``valid_from``
    is the first order-timestamp of the run and ``valid_to`` the start
    of the next run (NULL on the current row). ``order`` must be a
    deterministic total order within each key.
    """
    w = Window.partitionBy(key).orderBy(*order)
    ts = F.col(order[0])
    # NULL-safe change detection (review r5): plain != propagates NULL,
    # so a NULL attr row silently merged into the preceding run AND the
    # row after it started a spurious run (lag(attr) IS NULL is
    # ambiguous between "first row" and "previous state was NULL").
    # lag over a constant disambiguates the first row; eqNullSafe makes
    # NULL a real state value with its own runs.
    changed = (
        F.when(F.lag(F.lit(1)).over(w).isNull(), F.lit(1))
        .when(~F.col(attr).eqNullSafe(F.lag(attr).over(w)), F.lit(1))
        .otherwise(F.lit(0))
    )
    runs = df.withColumn("__run", F.sum(changed).over(w))
    collapsed = runs.groupBy(key, "__run").agg(
        # min, not first: every run now holds ONE distinct attr value,
        # and min of equal values is deterministic under any shuffle
        # (first() is order-dependent) — and it matches the oracle.
        F.min(attr).alias(attr),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_runs = Window.partitionBy(key).orderBy("__run")
    return collapsed.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Declared query + oracle
# ---------------------------------------------------------------------------

def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's event-type state: one row per run
    of consecutive same-type events, with its validity interval."""
    events = load_table(spark, sf_dir, "events")
    return scd2_collapse(events, "user_id", "event_type", ["ts", "event_id"])


_HISTORY_CTE = """
    flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(1) OVER w IS NULL THEN 1
                    WHEN event_type IS DISTINCT FROM lag(event_type) OVER w THEN 1
                    ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT *, sum(chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS run
        FROM flagged
    ),
    collapsed AS (
        SELECT user_id, run,
               min(event_type) AS event_type,
               date_trunc('microsecond', min(ts)) AS valid_from,
               count(1)::BIGINT AS n_events
        FROM runs GROUP BY user_id, run
    )
"""

ORACLES: dict[str, str] = {
    # same 4-step build in DuckDB SQL, from the ONE shared history CTE
    # (the point-lookup oracle composes the same string — two
    # hand-maintained copies had already drifted; review r5).
    # (ts, event_id) gives both engines the identical total order;
    # IS DISTINCT FROM mirrors the Spark side's eqNullSafe.
    "q_scd2_history": f"""
        WITH {_HISTORY_CTE}
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY run) AS valid_to,
               n_events
        FROM collapsed
    """,
}

QUERIES = {"q_scd2_history": q_scd2_history}

BENCH = ["q_scd2_history"]


# ---------------------------------------------------------------------------
# point-in-time lookup against the history
# ---------------------------------------------------------------------------

#: probe instants (hours into the capture day) for the declared query
POINT_LOOKUP_HOURS = (0, 6, 12, 18)


def scd2_point_lookup(history: DataFrame, probes: DataFrame) -> DataFrame:
    """(key, probe_ts, attr, n_events) — reconstruct each key's state
    AS OF each probe instant from its SCD2 history: the canonical
    point-in-time temporal join (`valid_from <= t < valid_to`, open
    intervals match everything after ``valid_from``). Probes with no
    valid version (before the key's first run) surface with NULL state
    — absence is part of the answer.

    Scale shape: equi-join on the key with the validity predicate as a
    residual filter — per-key history is short (version chains), so
    the residual scan is bounded; no range-join nested loop. At very
    long histories you'd bucket valid_from like operators/asof.py."""
    h = history.select(
        F.col("key").alias("k"),
        "attr",
        "valid_from",
        "valid_to",
        "n_events",
    )
    return (
        probes.join(
            h,
            (probes["key"] == h["k"])
            & (h["valid_from"] <= probes["probe_ts"])
            & (h["valid_to"].isNull() | (probes["probe_ts"] < h["valid_to"])),
            "left",
        )
        .select(probes["key"], "probe_ts", "attr", "n_events")
    )


def q_scd2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every user's event-type state reconstructed at four fixed
    instants of the capture day — the time-travel read over
    [[q_scd2_history]]'s versioned state."""
    events = load_table(spark, sf_dir, "events")
    history = scd2_collapse(events, "user_id", "event_type", ["ts", "event_id"]).select(
        F.col("user_id").alias("key"),
        F.col("event_type").alias("attr"),
        "valid_from",
        "valid_to",
        "n_events",
    )
    day0 = events.agg(
        F.date_trunc("day", F.min("ts")).alias("d0")
    )
    hours = F.array(*[F.lit(hh) for hh in POINT_LOOKUP_HOURS])
    probes = (
        events.select(F.col("user_id").alias("key")).distinct()
        .crossJoin(F.broadcast(day0))
        .select(
            "key",
            F.explode(hours).alias("hh"),
            "d0",
        )
        .select(
            "key",
            # timestampadd, not a unix_timestamp epoch round-trip: the
            # epoch form was only correct under the UTC session pin
            # (local-time interpretation on one side, naive arithmetic
            # on the oracle's) — interval addition is TZ-robust.
            F.expr("timestampadd(HOUR, hh, d0)").alias("probe_ts"),
        )
    )
    return scd2_point_lookup(history, probes).orderBy("key", "probe_ts", "attr")


ORACLES["q_scd2_point_lookup"] = f"""
    WITH {_HISTORY_CTE},
    history AS (
        SELECT user_id AS key, event_type AS attr, valid_from,
               lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY run) AS valid_to,
               n_events
        FROM collapsed
    ),
    day0 AS (
        SELECT date_trunc('day', min(ts)) AS d0 FROM events
    ),
    probes AS (
        SELECT u.key,
               d0 + to_seconds(hh.hh * 3600) AS probe_ts
        FROM (SELECT DISTINCT user_id AS key FROM events) u
        CROSS JOIN day0
        CROSS JOIN (VALUES {", ".join(f"({hh})" for hh in POINT_LOOKUP_HOURS)}) hh(hh)
    )
    SELECT p.key, p.probe_ts, h.attr, h.n_events
    FROM probes p
    LEFT JOIN history h
      ON h.key = p.key
     AND h.valid_from <= p.probe_ts
     AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
    ORDER BY p.key, p.probe_ts, h.attr
"""

QUERIES["q_scd2_point_lookup"] = q_scd2_point_lookup
