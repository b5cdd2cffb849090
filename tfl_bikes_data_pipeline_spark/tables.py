"""Loaders for the synthetic star-schema test tables (TESTDATA.md).

Parquet scans stay declarative so Catalyst performs column pruning and
predicate pushdown into the parquet reader (the reference hand-rolls this
with a manual BigQuery ``filter`` option, ``spark/transform_load.py:465-483``
— here it is free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import ensure_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events fixture's TIMESTAMP(NANOS) column to a plain
    ``TimestampType``, whatever way this Spark build decoded it.

    Parquet nanosecond timestamps have no stable arrival type across
    Spark versions: with ``spark.sql.legacy.parquet.nanosAsLong=true``
    some builds deliver ``LongType`` nanos, others ignore the conf and
    deliver ``TimestampNTZType`` (observed on 4.1.x). Every downstream
    site assumes session-TZ ``TimestampType``, so both batch
    (:func:`load_table`) and streaming (``streaming.jobs``) reads route
    through this one converter — the two paths cannot drift apart again.

    - ``LongType`` (nanos-as-long): integer ns→µs math, then
      ``timestamp_micros`` (ns magnitudes exceed double precision, so no
      float division).
    - ``TimestampNTZType``: reinterpreted under the pinned UTC session TZ
      (``ensure_runtime_confs``), which is value-identical.
    - ``TimestampType``: already normalized, no-op.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


#: probe results keyed on the conf that decides the arrival type — a
#: later SparkSession in the same process with a different nanosAsLong
#: setting gets its own probe, never a stale cache hit.
_NANOS_ARRIVAL_TYPE: dict[str, T.DataType] = {}


def nanos_arrival_type(spark: SparkSession) -> T.DataType:
    """How THIS Spark build decodes a parquet TIMESTAMP(NANOS) column
    (LongType under an honored ``nanosAsLong``, TimestampNTZType where
    the conf is ignored — observed on 4.1.x). Determined empirically
    once per (process, nanosAsLong-conf): a 1-row nanos parquet is
    written with pyarrow and read back, so callers that must DECLARE a
    schema before any real file exists (the streaming fallback) declare
    what this build will actually deliver instead of guessing."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    ensure_runtime_confs(spark)
    key = str(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"))
    if key not in _NANOS_ARRIVAL_TYPE:
        d = tempfile.mkdtemp(prefix="nanos_probe_")
        try:
            pq.write_table(
                pa.table({"ts": pa.array([0], type=pa.timestamp("ns"))}),
                os.path.join(d, "probe.parquet"),
                version="2.6",  # preserve nanos in the physical type
            )
            _NANOS_ARRIVAL_TYPE[key] = spark.read.parquet(d).schema["ts"].dataType
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return _NANOS_ARRIVAL_TYPE[key]


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — a driver-side
    footer read, no Spark job. This is the table-stats lookup every
    warehouse catalog provides; operators that size themselves from the
    corpus cardinality (e.g. the IVF-blocked dedup's centroid count)
    read it here instead of paying a ``count()`` scan per invocation.
    Handles both a single parquet file and a directory of part files."""
    import glob

    import pyarrow.parquet as pq

    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Entry points must be self-sufficient: the caller may hold a *plain*
    # SparkSession (the driver harness does), so correctness-bearing confs
    # (nanos-parquet read, UTC session TZ, ...) are applied here at runtime
    # rather than assumed from the session factory.
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so the SQL API surface (the analog of
    the reference's ``sql/aggregations.sql`` analyst queries) can run."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
