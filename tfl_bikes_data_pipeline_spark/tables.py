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


#: Schema catalog (r13 optimization round): resolved parquet schemas
#: keyed on (path, file stats, nanos-read conf). METADATA ONLY — the
#: exact role a warehouse metastore plays; the data itself is re-read
#: from parquet by every query, nothing row- or statistic-shaped is
#: memoized. Motivation (measured, OPTIMIZATION_r13.md): a schema-less
#: ``spark.read.parquet`` pays footer schema inference on every plan
#: build — 60-85 ms per call on the fixtures vs 8-18 ms with the schema
#: supplied — and the suite builds ~2.5 scans per query, so inference
#: alone cost tens of seconds per bench pass. Keys carry every file's
#: (name, mtime, size) so a fixture swap invalidates, plus the
#: nanosAsLong conf because it changes the ARRIVAL type of
#: TIMESTAMP(NANOS) columns (see nanos_arrival_type).
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def _cached_schema(spark: SparkSession, path: str) -> T.StructType:
    import glob

    if os.path.isfile(path):
        st = os.stat(path)
        files_key: tuple = ((path, st.st_mtime_ns, st.st_size),)
    else:
        files_key = tuple(
            (f, os.stat(f).st_mtime_ns, os.stat(f).st_size)
            for f in sorted(
                glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )
        )
    conf_key = str(
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    )
    key = (path, files_key, conf_key)
    if key not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _SCHEMA_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Entry points must be self-sufficient: the caller may hold a *plain*
    # SparkSession (the driver harness does), so correctness-bearing confs
    # (nanos-parquet read, UTC session TZ, ...) are applied here at runtime
    # rather than assumed from the session factory.
    ensure_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.schema(_cached_schema(spark, path)).parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    return df


def ensure_scan_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition ONLY when the scan yields fewer splits
    than half the scheduler's slots — the local-fixture case (one small
    parquet file = one split = one core doing all the narrow per-row
    work). On any real deployment the scan has ≥ thousands of splits
    and this returns ``df`` unchanged, so no full-corpus shuffle is
    baked into production plans. Shared by the dedup shingle paths
    (since r9) and, as of the r13 optimization round, the embedding/ANN
    scoring paths, whose broadcast nested-loop scoring otherwise runs
    single-task over the one-split embeddings fixture (profiled:
    1-2-task stages carrying 1-3 s of per-row vector math).

    The split-count probe reads the scan's FILE LISTING (r14):
    ``df.rdd.getNumPartitions()`` runs full physical planning + RDD
    conversion on the driver and measured 40-95 ms per call — paid at
    plan-BUILD time by every widened query, twice per bench run —
    while ``inputFiles()`` + stat arithmetic measures 1-4 ms for the
    identical widen-or-not decision. The estimate mirrors Spark's
    FilePartition packing to first order (each file contributes
    ceil(size / maxPartitionBytes) splits; sub-128MB files are counted
    once — packing multiple tiny files into one split only LOWERS the
    true split count, which errs toward widening small scans, the safe
    direction). Callers pass scan-shaped frames (load_table outputs);
    non-file-backed or non-local frames fall back to the RDD probe."""
    slots = spark.sparkContext.defaultParallelism
    threshold = max(2, slots // 2)
    splits: int | None = None
    try:
        files = df.inputFiles()
        max_part = 128 << 20  # spark.sql.files.maxPartitionBytes default
        total = 0
        for uri in files:
            if uri.startswith("file:"):
                path = uri[len("file:"):]
                while path.startswith("//"):
                    path = path[1:]
            elif uri.startswith("/"):
                path = uri
            else:  # remote FS — no cheap local stat; use the RDD probe
                splits = None
                break
            total += -(-os.stat(path).st_size // max_part)
        else:
            splits = total
    except Exception:
        splits = None
    if splits is None:
        splits = df.rdd.getNumPartitions()
    if splits < threshold:
        return df.repartition(slots)
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
