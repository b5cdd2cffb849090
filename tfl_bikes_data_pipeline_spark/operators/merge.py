"""MERGE / upsert — Delta-style ``MERGE INTO`` semantics in pure Spark.

The reference's incremental loads are append-only month partitions
(``spark/transform_load.py`` write stages; our ``warehouse.py`` twin),
which is all its weekly-file cadence needs. A large-scale training-data
pipeline additionally needs *upsert*: re-delivered or corrected records
must replace their prior versions, and brand-new keys must insert —
without a table format that provides MERGE natively.

Spark-first design: one full-outer shuffle join on the key with
whole-row "matched → take update, else keep base" semantics (NOT
column-wise coalesce — an update row with a NULL column must win with
its NULL, exactly like ``WHEN MATCHED THEN UPDATE SET *``).

Scale notes:
- One key-hash shuffle per side, map-side nothing else; with the base
  stored bucketed on the key (``warehouse.write_bucketed``) the base
  side's Exchange disappears and only the (much smaller) update batch
  shuffles.
- Write-back composes with dynamic partition overwrite
  (``warehouse.write_partitioned``): restrict base to the partitions
  present in the update batch and only those partitions rewrite — the
  standard big-table MERGE pattern.
- The update batch must be key-unique (enforce upstream with
  ``dedup.incremental_dedup`` / exact dedup); duplicate update keys
  would fan out the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

#: Marker column used to detect "a matching update row exists".
_MATCH = "__upd_match"


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Return the merged snapshot of ``base`` with ``updates`` applied:
    matched keys take the update row wholesale, unmatched update keys
    insert, unmatched base keys persist. Both inputs must share a
    schema; ``updates`` must be unique per key."""
    cols = [c for c in base.columns if c not in keys]
    b = base.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in cols])
    u = updates.select(
        *keys, *[F.col(c).alias(f"__u_{c}") for c in cols], F.lit(1).alias(_MATCH)
    )
    matched = F.col(_MATCH).isNotNull()
    return b.join(u, keys, "full_outer").select(
        *keys,
        *[
            F.when(matched, F.col(f"__u_{c}")).otherwise(F.col(f"__b_{c}")).alias(c)
            for c in cols
        ],
    )


# ---------------------------------------------------------------------------
# Declared query + oracle
# ---------------------------------------------------------------------------

def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a synthetic correction batch into ``orders``: every 5th
    order re-priced at 90% and flagged 'U'; every 7th≡3 order re-keyed
    +100M as a new insert flagged 'N'."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    updates = base.where(k % 5 == 0).select(
        k.alias("o_orderkey"),
        (F.col("o_totalprice") * 0.9).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    ).unionByName(
        base.where(k % 7 == 3).select(
            (k + 100000000).alias("o_orderkey"),
            F.col("o_totalprice"),
            F.lit("N").alias("o_orderstatus"),
        )
    )
    return merge_upsert(base, updates, ["o_orderkey"])


ORACLES: dict[str, str] = {
    "q_merge_upsert": """
        WITH base AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        ),
        u AS (
            SELECT o_orderkey, o_totalprice * 0.9 AS o_totalprice,
                   'U' AS o_orderstatus, 1 AS m
            FROM base WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey + 100000000, o_totalprice, 'N', 1
            FROM base WHERE o_orderkey % 7 = 3
        )
        SELECT coalesce(u.o_orderkey, base.o_orderkey) AS o_orderkey,
               CASE WHEN u.m IS NOT NULL
                    THEN u.o_totalprice ELSE base.o_totalprice
               END AS o_totalprice,
               CASE WHEN u.m IS NOT NULL
                    THEN u.o_orderstatus ELSE base.o_orderstatus
               END AS o_orderstatus
        FROM base FULL OUTER JOIN u ON base.o_orderkey = u.o_orderkey
    """,
}

QUERIES = {"q_merge_upsert": q_merge_upsert}

BENCH = ["q_merge_upsert"]


def merge_partial_aggs(
    base: DataFrame, delta: DataFrame, keys: list[str], sums: list[str]
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: combine a stored
    aggregate table with the aggregate of a new batch by SUMMING the
    additive measures per key (counts are sums; avg = sum/cnt at read
    time; min/max are monotone merges — anything algebraic works, only
    holistic measures like exact medians force recompute). The grouped
    union is one shuffle over |keys| aggregate rows, never a re-scan of
    history — at 100 TB the difference between maintaining a rollup
    and rebuilding it."""
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sums])
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """CDC between two snapshots of a keyed table: one full-outer join,
    rows classified inserted / deleted / changed / unchanged. Value
    comparison is null-safe (``<=>``) column-wise, so NULL→value and
    value→NULL transitions count as changes — the audit you run before
    promoting a rebuilt table over the serving copy. The two snapshots
    must share a column set: a column added by the rebuild would
    otherwise be silently excluded from the comparison and its changes
    reported as 'unchanged' (schema evolution is a loud, explicit event
    in a pre-promotion audit, not a diff to paper over)."""
    if set(old.columns) != set(new.columns):
        raise ValueError(
            "snapshot_diff requires identical column sets; "
            f"only in old: {sorted(set(old.columns) - set(new.columns))}, "
            f"only in new: {sorted(set(new.columns) - set(old.columns))}"
        )
    cols = [c for c in old.columns if c not in keys]
    o = old.select(*keys, F.lit(1).alias("__in_old"),
                   *[F.col(c).alias(f"__o_{c}") for c in cols])
    n = new.select(*keys, F.lit(1).alias("__in_new"),
                   *[F.col(c).alias(f"__n_{c}") for c in cols])
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    return o.join(n, keys, "full_outer").select(
        *keys,
        F.when(F.col("__in_old").isNull(), F.lit("inserted"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-custkey order rollup: base = pre-1996 history's
    aggregate, delta = the 1996+ batch; merged partials must equal the
    full recompute (which is exactly what the oracle does)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,6)").alias("p"),
    )
    cut = "1996-01-01"
    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("p").alias("total"),
        )
    base = agg(orders.where(F.col("o_orderdate") < cut))
    # the split must be TOTAL over the column's domain: a NULL date
    # satisfies neither < nor >=, and a dropped row would diverge from
    # the oracle's unfiltered full recompute (fixtures carry no NULL
    # dates today — the partition is made total so that stays a fact
    # about the data, not a correctness precondition).
    delta = agg(
        orders.where((F.col("o_orderdate") >= cut) | F.col("o_orderdate").isNull())
    )
    merged = merge_partial_aggs(base, delta, ["o_custkey"], ["n_orders", "total"])
    return merged.select(
        "o_custkey", "n_orders", F.col("total").cast("string").cast("double").alias("total")
    ).orderBy("o_custkey")


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two synthetic snapshots of orders: the 'new' snapshot
    drops every 11th order, re-prices every 7th, inserts re-keyed
    copies of every 13th — per-class counts."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    k = F.col("o_orderkey")
    new = (
        base.where(k % 11 != 0)
        .select(
            "o_orderkey",
            F.when(k % 7 == 0, F.col("price") * 1.1).otherwise(F.col("price")).alias("price"),
        )
        .unionByName(
            base.where(k % 13 == 0).select(
                (k + 200000000).alias("o_orderkey"), F.col("price")
            )
        )
    )
    return (
        snapshot_diff(base, new, ["o_orderkey"])
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("change")
    )


ORACLES["q_incremental_agg"] = """
    SELECT o_custkey, count(1)::BIGINT AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
"""

ORACLES["q_snapshot_diff"] = """
    WITH base AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders
    ),
    new_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN price * 1.1 ELSE price END AS price
        FROM base WHERE o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_orderkey + 200000000, price FROM base WHERE o_orderkey % 13 = 0
    ),
    classified AS (
        SELECT CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
                    WHEN n.o_orderkey IS NULL THEN 'deleted'
                    WHEN b.price IS NOT DISTINCT FROM n.price THEN 'unchanged'
                    ELSE 'changed' END AS change
        FROM base b FULL OUTER JOIN new_snap n USING (o_orderkey)
    )
    SELECT change, count(1)::BIGINT AS cnt
    FROM classified GROUP BY change ORDER BY change
"""

QUERIES["q_incremental_agg"] = q_incremental_agg
QUERIES["q_snapshot_diff"] = q_snapshot_diff
BENCH.extend(["q_incremental_agg", "q_snapshot_diff"])


def latest_per_key(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Change-log compaction: the newest record per key (row_number = 1
    over the key by descending ``order``) — how an append-only CDC/event
    log becomes a queryable current-state snapshot without a MERGE per
    batch. One shuffle on the key; with the log stored bucketed on the
    key even that disappears. ``order`` must totally order each key's
    records (ts + a unique tiebreak), or "latest" is shuffle-dependent."""
    if "__rn" in df.columns:
        raise ValueError(
            "latest_per_key reserves the column name '__rn'; rename the "
            "input column (a silent overwrite would drop user data)"
        )
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state per user from the event log: the newest event's
    type and value, with its timestamp."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(
        events.select("user_id", "ts", "event_id", "event_type", "value"),
        ["user_id"],
        ["ts", "event_id"],
    ).orderBy("user_id")


ORACLES["q_latest_snapshot"] = """
    SELECT user_id, date_trunc('microsecond', ts) AS ts, event_id,
           event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
"""

QUERIES["q_latest_snapshot"] = q_latest_snapshot
BENCH.append("q_latest_snapshot")
