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


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    partitions: list | None = None,
) -> None:
    """Rewrite a partitioned table's fragmented partitions into
    ``files_per_partition`` files each — the small-files maintenance
    pass every incremental warehouse needs (weekly appends leave one
    file per batch per month; a year later each month is hundreds of
    tiny files and scan planning drowns in footer reads).

    Content is untouched: the rewrite is read → repartition → dynamic
    partition overwrite, so only the listed ``partitions`` (default:
    all) are replaced, atomically per partition, and concurrent readers
    of other partitions never see a change. ``repartition(n, cols)``
    hashes rows to exactly ``n`` files per partition directory — at
    cluster scale pick n from target file size (~128 MB), here the
    mechanism is what's under test.

    In-place rewrite is safe because dynamic partition overwrite
    commits (deletes + swaps) only after the read job's tasks finish;
    for belt-and-braces on a live table, stage to a sibling dir and
    swap, or take a partition-level maintenance lock."""
    df = spark.read.parquet(path)
    if partitions is not None:
        df = df.where(F.col(partition_cols[0]).isin(partitions))
    (
        df.repartition(files_per_partition, *[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def optimize_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    zorder_by: tuple[str, str] | None = None,
    files_per_partition: int = 1,
) -> None:
    """Table maintenance in one pass — the ``OPTIMIZE [ZORDER BY]``
    equivalent for the plain-parquet warehouse: compact each partition
    to ``files_per_partition`` files and, when ``zorder_by`` is given,
    lay rows inside each partition along the Morton curve of the two
    columns (``functions.zorder``), so row-group min/max stats prune on
    both dimensions in addition to the partition key. One read + one
    clustered dynamic-overwrite write; same in-place safety note as
    ``compact_partitions``."""
    df = spark.read.parquet(path)
    if zorder_by is None:
        compact_partitions(spark, path, partition_cols, files_per_partition)
        return
    from .functions.zorder import quantile_rank, zvalue

    z = zvalue(
        quantile_rank(df, zorder_by[0], bits=6),
        quantile_rank(df, zorder_by[1], bits=6),
        bits=6,
    )
    (
        df.withColumn("__z", z)
        .repartition(files_per_partition, *[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*partition_cols, "__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
