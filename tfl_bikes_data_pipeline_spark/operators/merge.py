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

from pyspark.sql import DataFrame, SparkSession
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
