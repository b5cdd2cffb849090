"""Partitioned-Parquet warehouse helpers.

Stands in for the reference's BigQuery warehouse: month-partitioned
tables with first-run-overwrite / later-append semantics
(``spark/transform_load.py:58-90,438,496-509``;
``airflow/dags/spark_transform_load.py:196-211``).

Scale posture: partition columns are low-cardinality (YYYYMM), so a
write produces one directory per month; ``partitionOverwriteMode=dynamic``
(set in the session factory) makes month re-runs idempotent — only the
months present in the incoming frame are replaced, never the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def month_partition(ts_col: str = "ts") -> "F.Column":
    """YYYYMM string partition value (reference directory layout
    ``{table}/{YYYYMM}/``, ``airflow/dags/ingest_bike_data.py:353``)."""
    return F.date_format(F.col(ts_col), "yyyyMM")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
) -> None:
    """Write a partitioned parquet table.

    mode="overwrite" with dynamic partition overwrite replaces only the
    partitions present in ``df`` — the idempotent month re-run.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_warehouse(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    location: str,
    sort_col: str | None = None,
) -> None:
    """Catalog-managed bucketed table: rows hash-partitioned into
    ``n_buckets`` files by ``bucket_col`` at write time. Two tables
    bucketed the same way equi-join with ZERO exchange — the shuffle is
    paid once at ingest instead of per query, the decisive layout for
    repeated fact⨝fact joins at 100 TB (asserted in
    tests/test_plan_quality.py). Optional per-bucket sort enables
    sort-merge without a sort step."""
    writer = df.write.mode("overwrite").option("path", location).bucketBy(
        n_buckets, bucket_col
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)
