"""Data-profiling operators (SURVEY.md §2.5 A4/A5).

The reference profiles every intermediate table — per-column dtypes and
null counts (``spark/transform_load.py:38-55``, called after each
transform) — and derives dimension-scan pushdown bounds from a global
min/max aggregate (``:460-463``). Both are single hash aggregates here:
null accounting is one pass over all columns at once (map-side partial
counts, one scalar row out — no per-column jobs), and the bounds
aggregate is the same one-row collect the reference feeds its BigQuery
``filter`` string.

``q_profile_nulls`` runs the null audit over the aligned-metrics
dimension (the one parity table that genuinely contains NULLs — missing
weather observations are tolerated by design,
``docs/3_data_transformation.md:32``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipelines import ORACLES as PIPELINE_ORACLES
from ..plans.pipelines import build_aligned_weather
from ..tables import load_table


def null_count(col: str) -> Column:
    """NULL tally for one column, aggregation-ready."""
    return F.sum(F.col(col).isNull().cast("int")).cast("long").alias(f"{col}_nulls")


def profile_nulls(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-row null audit: row_count + per-column null counts in a single
    aggregate (reference get_column_types_from_df, transform_load.py:52-55)."""
    columns = columns or df.columns
    return df.agg(
        F.count(F.lit(1)).alias("row_count"),
        *[null_count(c) for c in columns],
    )


def scan_bounds(df: DataFrame, ts_col: str) -> tuple:
    """(min, max) of a timestamp column — the dynamic pushdown bounds the
    reference passes to its dimension scans (transform_load.py:460-465).
    One-row action; downstream scans then ``.where()`` between the bounds
    and Catalyst pushes the predicate into the parquet reader."""
    row = df.agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")).first()
    return row["lo"], row["hi"]


def q_profile_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    aligned = build_aligned_weather(load_table(spark, sf_dir, "events"))
    return profile_nulls(aligned, ["click_value", "view_value", "purchase_value"])


def q_minmax_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounds aggregate as a declared (checkable) relation."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


QUERIES = {
    "q_profile_nulls": q_profile_nulls,
    "q_minmax_bounds": q_minmax_bounds,
}

ORACLES: dict[str, str] = {
    # The aligned-dimension CTE is the p_weather_align oracle verbatim —
    # the audit must profile exactly the relation that pipeline declares.
    "q_profile_nulls": f"""
        WITH aligned AS ({PIPELINE_ORACLES["p_weather_align"]})
        SELECT count(1)::BIGINT AS row_count,
               (count(1) - count(click_value))::BIGINT AS click_value_nulls,
               (count(1) - count(view_value))::BIGINT AS view_value_nulls,
               (count(1) - count(purchase_value))::BIGINT AS purchase_value_nulls
        FROM aligned
    """,
    "q_minmax_bounds": """
        SELECT count(1)::BIGINT AS n_rows,
               date_trunc('microsecond', min(ts)) AS min_ts,
               date_trunc('microsecond', max(ts)) AS max_ts
        FROM events
    """,
}
