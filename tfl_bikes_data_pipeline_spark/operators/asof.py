"""As-of and range (interval) joins — temporal operators Spark has no
native keyword for, composed from built-ins (SURVEY.md §7 "custom
operators": composition first, Pandas UDF only if semantics demand).

The reference approximates an as-of match by equi-joining minute events
to daily observations on the calendar triple
(``spark/transform_load.py:365-373``) — correct only because its
observation grain is exactly daily. The general operator here matches
each left row to the latest right row with ``ts_r <= ts_l`` per key:

- **asof_join** — single-shuffle formulation: tag both sides, union,
  one window pass with ``last(..., ignorenulls=True)`` over
  (key, time) ordering, keep left rows. No range explosion, no
  per-row lookup; state per partition is one row of carried values.
  At equal timestamps the right row sorts first, so ``>=`` matching
  semantics hold (same as DuckDB ASOF JOIN, which oracles this).

- **range_join** — left rows matched to right intervals
  ``[start, end)`` sharing a key: an equi-join on the key with the
  range predicate attached, so the shuffle is keyed (never a cross
  join); AQE handles per-key skew. For keyless interval joins, bucket
  both sides by coarse time bucket first (not needed for the declared
  surface).

Scale: both operators shuffle once on (key); the as-of window carries
O(right columns) of state per partition — at 100 TB the partition count
scales out and the window never materializes more than a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact_sum
from ..tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """LEFT as-of join: every ``left`` row + the ``value_cols`` of the
    most recent ``right`` row with ``right_ts <= left_ts`` on the same
    ``key`` (nulls when no prior observation exists).

    Row-level semantics (review r5): the matched right row is carried
    as ONE STRUCT through the window fill, so (a) a NULL inside the
    matched row stays NULL instead of being replaced by an older
    observation, and (b) with several value_cols the output never mixes
    columns from different right rows. Right rows with a NULL key or
    NULL timestamp are dropped up front — NULL never equi-matches and
    ``right_ts <= left_ts`` is never true for NULL (window partitioning
    would otherwise treat them as matchable, diverging from the ASOF
    oracle). Ties on (key, right_ts) break deterministically by a
    content digest (arbitrary but stable); exact oracle parity at tied
    timestamps requires the right side unique per (key, ts), as the
    declared query's daily grain is."""
    overlap = (set(left.columns) - {key, left_ts}) & set(value_cols)
    if overlap:
        raise ValueError(f"left columns collide with value_cols: {sorted(overlap)}")
    reserved = {"__t", "__is_left", "__obs", "__tb", "__fobs"}
    bad = reserved & (set(left.columns) | set(value_cols))
    if bad:
        raise ValueError(f"reserved column names in inputs: {sorted(bad)}")

    obs_struct = F.struct(*[F.col(c) for c in value_cols])
    r_clean = right.where(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    r_tagged = r_clean.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        obs_struct.alias("__obs"),
        F.md5(F.to_json(obs_struct)).alias("__tb"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, left_ts)
        ],
    )
    null_obs = F.lit(None).cast(
        r_tagged.schema["__obs"].dataType
    )
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        null_obs.alias("__obs"),
        F.lit("").alias("__tb"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
    )
    # right rows sort before left rows at the same instant → `<=` match;
    # equal-ts right rows order by content digest → deterministic pick.
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__is_left", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged).select(
        "*", F.last("__obs", ignorenulls=True).over(w).alias("__fobs")
    )
    keep = [c for c in left.columns if c not in (key, left_ts)]
    return filled.where(F.col("__is_left") == 1).select(
        F.col(key),
        F.col("__t").alias(left_ts),
        *[F.col(c) for c in keep],
        *[F.col("__fobs").getField(c).alias(c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    how: str = "inner",
) -> DataFrame:
    """Keyed interval join: left rows to right intervals with
    ``start <= ts < end`` on the same key. Equi-join on the key keeps
    the shuffle bounded; the range predicate rides along.

    Inputs are aliased so self-join lineage (left and right derived
    from the same DataFrame) resolves instead of tripping
    AMBIGUOUS_SELF_JOIN, and the output key is COALESCED across sides
    so how='right'/'full' keeps the interval key of unmatched right
    rows (the earlier drop(right[key]) silently nulled it)."""
    l, r = left.alias("__rj_l"), right.alias("__rj_r")
    lk, rk = F.col(f"__rj_l.{key}"), F.col(f"__rj_r.{key}")
    joined = l.join(
        r,
        (lk == rk)
        & (F.col(f"__rj_l.{ts}") >= F.col(f"__rj_r.{start}"))
        & (F.col(f"__rj_l.{ts}") < F.col(f"__rj_r.{end}")),
        how,
    )
    return joined.select(
        F.coalesce(lk, rk).alias(key),
        *[F.col(f"__rj_l.{c}").alias(c) for c in left.columns if c != key],
        *[F.col(f"__rj_r.{c}").alias(c) for c in right.columns if c != key],
    )


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------

def _daily_obs(events: DataFrame) -> DataFrame:
    """Per-(user, day) observation table — the as-of right side (daily
    grain, observation stamped at midnight)."""
    return (
        events.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(exact_sum("value", "obs_value"))
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("obs_ts"),
            "obs_value",
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event + the latest daily observation at-or-before it."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    obs = _daily_obs(load_table(spark, sf_dir, "events"))
    out = asof_join(
        events, obs, key="user_id", left_ts="ts", right_ts="obs_ts",
        value_cols=["obs_value"],
    )
    return out.select("event_id", "user_id", "obs_value")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per customer order-window: orders open a 30-day interval;
    count each customer's events inside each window."""
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("cust"), "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("w_end"),
    )
    joined = range_join(events, orders, key="cust", ts="ts", start="w_start", end="w_end")
    return (
        joined.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("o_orderkey")
    )


QUERIES = {"q_asof_join": q_asof_join, "q_range_join": q_range_join}

ORACLES: dict[str, str] = {
    # DuckDB's native ASOF JOIN checks the window-fill formulation.
    "q_asof_join": """
        WITH obs AS (
            SELECT user_id,
                   CAST(CAST(ts AS DATE) AS TIMESTAMP) AS obs_ts,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS obs_value
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT e.event_id, e.user_id, o.obs_value
        FROM events e
        ASOF LEFT JOIN obs o
          ON e.user_id = o.user_id AND e.ts >= o.obs_ts
    """,
    "q_range_join": """
        SELECT o.o_orderkey, count(1)::BIGINT AS n_events
        FROM events e
        JOIN orders o
          ON e.user_id = o.o_custkey
         AND e.ts >= o.o_orderdate
         AND e.ts < o.o_orderdate + INTERVAL 30 DAY
        GROUP BY o.o_orderkey
        ORDER BY o.o_orderkey
    """,
}
