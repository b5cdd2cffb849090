"""Skew-mitigation utilities for hot keys (the 100 TB posture).

AQE's skew-join handling (enabled in the session factory) splits
oversized shuffle partitions at runtime, but two patterns still need
explicit salting on a real cluster:

- **Salted broadcast-side replication** (``salted_join``): a shuffle
  join where one side has a few hot keys. The small side is replicated
  ``n_salts`` times (one row per salt), the big side gets a
  deterministic salt from a high-cardinality column, and the join runs
  on (key, salt) — each hot key's rows spread over ``n_salts``
  partitions. Results are identical to the plain join.

- **Two-stage aggregation** (``salted_group_count``): a group-count
  whose key distribution is heavily skewed. Stage 1 groups on
  (key, salt) — partial counts spread across partitions; stage 2 sums
  the partials per key. Spark's own partial aggregation already does
  this for algebraic aggregates; the explicit form matters when the
  per-key state is large (e.g. collect_set) or when a downstream
  repartition would re-concentrate the hot key.

Salts are deterministic (hash of a designated column, not rand()), so
plans stay reproducible and re-runnable — required for the oracle gate
and for idempotent month re-runs.

MEASURED (tools/skew_ab.py, round 8 — 90%-hot single key, plain vs
salted, best-of-2, broadcast disabled for the join):

- ``salted_join`` EARNS its place: 1.24× faster than the plain
  shuffle join at 4M rows, 1.44× at 12M (the gap grows with scale).
  AQE's skew-join split did NOT fire on this shape — its trigger is
  byte-sized partitions (256 MB advisory default), and a
  row-count-bound hot key of narrow rows stays under the byte
  threshold while still serializing one task. Explicit salting is the
  mitigation for exactly that gap (plus the inputs AQE refuses:
  stream-static joins, bucketed scans).
- ``salted_group_count`` does NOT pay for algebraic aggregates: the
  plain plan wins ~1.9× at 4M rows (0.28s vs 0.54s) and still wins at
  12M (0.48s vs 0.56s) — hash-aggregate PARTIAL rows collapse the hot
  key to one row per map task before the shuffle, so the salt only
  adds a second shuffle. Even for large per-key state (collect_set of
  a unique column) the two-stage form is a wash at these scales
  (5.39s vs 5.87s at 12M): the explode+re-dedup merge costs what the
  spread saves. Keep it for the documented niche — non-algebraic
  per-key state BIG enough that one task's state OOMs — and reach for
  it only after the plain plan has actually failed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salt_col(from_col: str | Column, n_salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic salt in [0, n_salts): hash of a high-cardinality
    column (NOT the skewed key — salting must split, not follow, the
    hot key)."""
    c = F.col(from_col) if isinstance(from_col, str) else from_col
    return F.pmod(F.hash(c), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key rows of
    ``big`` spread over ``n_salts`` shuffle partitions. ``small`` is
    exploded ×n_salts (cheap — it's the small side by assumption).

    Only big-side-preserving joins are meaningful under the ×n_salts
    replication: a right/full/outer join would emit one null-padded
    phantom row per UNMATCHED replica of the small side (up to
    n_salts per key) — silently wrong, so those modes are rejected
    (review r5)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got how={how!r} "
            "(the small side's salt replication makes right/full joins emit "
            "phantom null-padded rows)"
        )
    for side, df in (("big", big), ("small", small)):
        if "__salt" in df.columns:
            raise ValueError(f"{side} side already has a '__salt' column")
    salted_big = big.withColumn("__salt", salt_col(salt_from, n_salts))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [key, "__salt"], how).drop("__salt")


def salted_group_count(
    df: DataFrame, key: str, salt_from: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Two-stage skew-safe group-count: (key, salt) partial counts, then
    per-key final sum. Output: (key, cnt) — identical to
    ``df.groupBy(key).count()``."""
    clash = {"__salt", "__pc"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has reserved columns {sorted(clash)}")
    partial = (
        df.withColumn("__salt", salt_col(salt_from, n_salts))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__pc"))
    )
    return partial.groupBy(key).agg(F.sum("__pc").cast("long").alias("cnt"))


# ---------------------------------------------------------------------------
# declared query: the salted plan must produce the PLAIN join's answer
# ---------------------------------------------------------------------------

#: tiny enrichment dim keyed on the 3-value (maximally hot) event_type
#: — the canonical skewed-join shape.
TYPE_WEIGHTS = (("click", 1), ("purchase", 5), ("view", 2))


def q_skew_salted_join(spark, sf_dir: str) -> DataFrame:
    """Events ⋈ type-weight dim via the salted join (salt from the
    high-cardinality event_id), rolled up per type with exact-decimal
    weighted sums. The oracle is the UNSALTED join — correctness of
    salting IS result-identity with the plain plan; the salted shape is
    what survives a hot key that AQE cannot split (giant per-key state,
    pre-partitioned inputs)."""
    from ..tables import load_table

    events = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        list(TYPE_WEIGHTS), ["event_type", "weight"]
    )
    joined = salted_join(events, dim, "event_type", "event_id")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                (F.col("value") * F.col("weight")).cast("decimal(18,6)")
            )
            .cast("string")
            .cast("double")
            .alias("weighted_value"),
        )
        .orderBy("event_type")
    )


ORACLES: dict[str, str] = {
    "q_skew_salted_join": f"""
        WITH dim(event_type, weight) AS (
            VALUES {", ".join(f"('{t}', {w})" for t, w in TYPE_WEIGHTS)}
        )
        SELECT e.event_type, count(1)::BIGINT AS cnt,
               CAST(CAST(sum(CAST(e.value * d.weight AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   AS weighted_value
        FROM events e JOIN dim d USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
    """,
}

QUERIES = {"q_skew_salted_join": q_skew_salted_join}
BENCH = ["q_skew_salted_join"]
