"""Structured Streaming layer (beyond-parity extension, SURVEY.md §2.11).

The reference's "streaming" is Airflow cron + append-mode batch
(weekly file drops re-read monthly). Idiomatic Spark shape: a file
source streamed with ``Trigger.AvailableNow``, event-time tumbling
windows with a watermark for late data, and ``foreachBatch`` into the
same partitioned warehouse the batch path writes
(``spark/transform_load.py:425-509`` equivalent).

The declared query runs the real streaming engine (micro-batches,
state store) to completion on the finite fixture and returns the
result table, so the DuckDB oracle can check it like any batch query.
"""

from __future__ import annotations

import json
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..session import ensure_runtime_confs
from ..tables import nanos_arrival_type, normalize_event_ts
from ..warehouse import month_partition


#: StreamingQueryProgress telemetry of the most recent drain, for the
#: streaming section of tools/plan_audit.py (verdict r12 task 7): plan
#: metrics of a drained memory-sink relation are near-empty by design,
#: so the audit reads runtime progress instead — rows/sec, state rows,
#: batch durations. A list of per-micro-batch progress dicts (the
#: engine's own JSON), newest last, overwritten at each drain's
#: termination. A reader attributing progress to a specific query
#: should CLEAR this before invoking the query (a drain that dies
#: before termination leaves the previous value in place).
LAST_PROGRESS: list[dict] = []


def record_progress(q) -> None:
    """Capture a finished StreamingQuery's recentProgress into
    LAST_PROGRESS. Called right after awaitTermination by every drain
    helper (memory-sink, snapshot, parquet, warehouse); best-effort —
    telemetry must never fail a drain."""
    global LAST_PROGRESS
    try:
        prog = q.recentProgress
        LAST_PROGRESS = [p if isinstance(p, dict) else json.loads(str(p)) for p in prog]
    except Exception:
        LAST_PROGRESS = []


def _fallback_stream_schema(spark: SparkSession) -> T.StructType:
    """Stream schema for a landing dir with no files yet (the schema
    probe needs at least one footer). ``ts`` is declared as whatever
    type THIS build decodes TIMESTAMP(NANOS) to — determined by the
    1-row pyarrow probe in :func:`..tables.nanos_arrival_type`, NOT
    hardcoded, so a build that honors nanosAsLong gets LongType here
    and the first real file decodes against a matching schema."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", nanos_arrival_type(spark)),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


from ..tmputil import sweep_tmpdir as _tmpdir  # staged fixture copies are swept at exit

# Scale-aware trigger sizing (VERDICT r7 item 3). The drain profile
# (tools/stream_state_profile.py, PLANS.md) measured steady drain cost as
# batch-COUNT-bound (~1.5-1.8 s per micro-batch at fixture state size), so a
# trigger hard-pinned at 1 file/batch makes wall grow linearly with
# landing-file count: the r7 10× replica staged 10 part files and drained
# 4-7× slower purely on micro-batch count. Target a fixed batch count
# instead — per-batch size carries the scale, batch count stays ~flat.
# (At a true 100 TB posture the equivalent byte-denominated knob is
# maxBytesPerTrigger; the staged fixtures here write equal-size parts, so
# file count is the byte proxy and keeps the option portable to the file
# source's required integer.) Floor of 1; a target of 3 preserves the
# multi-batch state-survival semantics every streaming test pins.
import os as _os

def _target_batches_from_env() -> int:
    """Parse SPARK_GRAFT_STREAM_TARGET_BATCHES defensively: a
    non-numeric value falls back to the documented default, and any
    value < 1 clamps to 1 (0 would divide-by-zero in files_per_trigger,
    a negative target is meaningless)."""
    raw = _os.environ.get("SPARK_GRAFT_STREAM_TARGET_BATCHES", "3")
    try:
        return max(1, int(raw))
    except ValueError:
        return 3


STREAM_TARGET_BATCHES = _target_batches_from_env()


#: data-file suffixes a landing zone may hold — parquet fixture drops,
#: NDJSON/text collector feeds. Sizing must count/weigh ALL of them or
#: a non-parquet landing silently falls back to the 1-file-per-batch /
#: floor-partition pathology the round-8 sizing work removed.
LANDING_DATA_SUFFIXES = (".parquet", ".txt", ".json")


def _is_landing_data_file(name: str) -> bool:
    return name.endswith(LANDING_DATA_SUFFIXES) and not name.startswith(("_", "."))


def files_per_trigger(landing_dir: str) -> int:
    """maxFilesPerTrigger sized so the drain takes ~STREAM_TARGET_BATCHES
    micro-batches regardless of how many part files land."""
    try:
        n = sum(1 for f in _os.listdir(landing_dir) if _is_landing_data_file(f))
    except OSError:
        n = 0
    return max(1, -(-n // STREAM_TARGET_BATCHES))


def _copy_events_fixture(sf_dir: str, landing: str, name: str) -> None:
    """Stage the events fixture as one landing file. Supports both
    fixture layouts the batch readers accept (tables.table_row_count):
    a single events.parquet file, or a directory of part files."""
    import os

    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        import glob

        for i, part in enumerate(sorted(glob.glob(f"{src}/*.parquet"))):
            shutil.copy(part, f"{landing}/{name.removesuffix('.parquet')}_{i}.parquet")
    else:
        shutil.copy(src, f"{landing}/{name}")


def stage_landing_dir(sf_dir: str) -> str:
    """The file stream source consumes a *directory* (the landing zone
    new weekly files drop into); stage the fixture file there."""
    landing = _tmpdir("events_landing_")
    _copy_events_fixture(sf_dir, landing, "events.parquet")
    return landing


def read_events_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a landing directory (one file per batch —
    mirrors the reference's weekly file drops).

    The stream source needs a declared schema, but the arrival type of
    the nanosecond ``ts`` column is Spark-build-dependent (long nanos vs
    TIMESTAMP_NTZ — see :func:`..tables.normalize_event_ts`). Probing the
    batch reader's resolved schema (a footer read, no data scan) keeps the
    declared stream schema in lockstep with however *this* build decodes
    the file, and the shared normalizer then converts exactly as the
    batch path does — the round-2 wrong-answer bug was these two paths
    drifting apart. An EMPTY landing dir (stream defined before the
    first file drop — the normal production order) falls back to the
    build-probed :func:`_fallback_stream_schema`; only the
    cannot-infer-schema AnalysisException takes that path — corrupt
    footers or permission errors still raise loudly."""
    from pyspark.errors import AnalysisException

    ensure_runtime_confs(spark)
    try:
        schema = spark.read.parquet(landing_dir).schema
    except AnalysisException as e:
        # ONLY the genuine no-files-yet case may fall back — a typo'd
        # landing path (PATH_NOT_FOUND), corrupt footer, or permission
        # error must fail fast at stream definition, not silently get
        # the fallback schema.
        get_class = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", lambda: None
        )
        if (get_class() or "") != "UNABLE_TO_INFER_SCHEMA":
            raise
        schema = _fallback_stream_schema(spark)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger(landing_dir))
        .parquet(landing_dir)
    )
    return normalize_event_ts(raw)


def tumbling_window_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling window aggregation with a late-data
    watermark: per (window, event_type) count + exact value sum.
    Works on both streaming and batch DataFrames (same plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("string").cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class rocksdb_state:
    """Context manager switching stateful streaming onto the RocksDB
    state store for queries STARTED inside the block (the provider is
    captured per query at start). This is the bounded-memory state
    choice at scale: the default HDFSBackedStateStoreProvider keeps
    every key in executor heap (state size is capped by memory), while
    RocksDB spills to local disk with incremental changelog
    checkpointing — the right posture for stream-stream joins or dedup
    whose key space grows with the corpus. Parity between the two
    providers is pinned in tests/test_streaming.py."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.key = "spark.sql.streaming.stateStore.providerClass"

    def __enter__(self):
        # conf.get returns the SQLConf-registered default when unset,
        # so "was it explicitly set" is unobservable here; restoring
        # the returned value (default or explicit) is semantically
        # identical either way.
        self.prev = self.spark.conf.get(self.key)
        self.spark.conf.set(self.key, ROCKSDB_STATE_PROVIDER)
        return self

    def __exit__(self, *exc):
        self.spark.conf.set(self.key, self.prev)
        return False


#: State partitioning for AvailableNow drains. Stateful streaming
#: fixes its state-store count at the session's shuffle-partition
#: setting, and every micro-batch pays per-store file I/O (a
#: stream-stream join keeps FOUR stores per partition) — so a drain
#: over a one-file trigger at 32 partitions spends its time fsyncing
#: 128 tiny state files. Sizing state partitioning to the data — the
#: same per-job sizing a cluster deployment does — cuts the join drain
#: ~3×. Batch plans are unaffected: the conf is restored after the
#: stream starts (state partitioning is captured at query start).
STREAM_DRAIN_PARTITIONS = 8

#: ceiling for the scale-aware drain sizing below — local[32]'s core
#: count; on a real cluster this would be executor-cores-driven.
STREAM_DRAIN_MAX_PARTITIONS = 32
#: landing bytes per state partition before the drain widens past the
#: fixture floor.
STREAM_DRAIN_BYTES_PER_PARTITION = 8 << 20


def drain_partitions_for(landing_dir: str) -> int:
    """State-partition count sized to the LANDING ZONE, not a constant
    (round 8): the fixed 8 was tuned so tiny fixture drains don't pay
    4 state stores × 32 partitions of fsync per micro-batch, but it
    also CAPS state parallelism — at 100× events (10M rows, 150k
    state keys) the per-key Python work of applyInPandasWithState and
    the per-key state-store inserts of dropDuplicates serialized onto
    8 threads of a 32-core box (measured 156s / 49s drains). Size by
    landing bytes: the fixture floor stays 8 (identical behavior and
    fsync cost on small drains), large landings widen toward the core
    count (~8 MB of input per state partition)."""
    try:
        total = sum(
            e.stat().st_size
            for e in _os.scandir(landing_dir)
            if _is_landing_data_file(e.name)
        )
    except OSError:
        total = 0
    return min(
        STREAM_DRAIN_MAX_PARTITIONS,
        max(
            STREAM_DRAIN_PARTITIONS,
            total // STREAM_DRAIN_BYTES_PER_PARTITION + 1,
        ),
    )


#: the previous drain's memory-sink table, dropped on the next drain.
_LAST_DRAIN_TABLE: str | None = None


def run_available_now(
    stream_df: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    drain_partitions: int | None = None,
) -> DataFrame:
    """Drive a streaming query to completion on the currently available
    input (Trigger.AvailableNow → memory sink). Default complete mode so
    every window — including the final, never-closed-by-watermark ones —
    is emitted; stateful operators that only support update mode pass
    ``output_mode="update"`` (the memory sink then keeps every emission).

    The memory sink pins the drained result in driver heap under its
    query name; dropping the PREVIOUS drain's table here caps the
    session's leak at one result set instead of one per invocation
    (the current name must survive — the returned frame reads it).

    SINGLE-LIVE-RESULT CONTRACT: the returned DataFrame reads the
    memory-sink temp view lazily, and that view is dropped by the NEXT
    call to run_available_now. A caller that needs to act on an earlier
    drain after starting a later one (e.g. comparing two drains) must
    materialize first — ``rows = df.collect()`` or
    ``df = df.localCheckpoint()`` — before invoking this again;
    otherwise the earlier frame resolves against a dropped view."""
    global _LAST_DRAIN_TABLE
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    if _LAST_DRAIN_TABLE is not None:
        spark.catalog.dropTempView(_LAST_DRAIN_TABLE)
    _LAST_DRAIN_TABLE = name
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # hold the reduced setting through awaitTermination: the streaming
    # engine captures shuffle partitions when it constructs the FIRST
    # micro-batch (async after start), not at start() itself.
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(
            STREAM_DRAIN_PARTITIONS
            if drain_partitions is None
            else drain_partitions
        ),
    )
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_progress(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def _epoch_marker_path(out_path: str, run_id: str, epoch_id: int) -> str:
    # plain string join, NOT os.path: out_path may be a URI (s3a://,
    # hdfs://) and the marker must live in the SAME filesystem as the
    # warehouse it guards.
    return f"{out_path.rstrip('/')}/_epochs/{run_id}-{epoch_id}"


def _marker_run_id(checkpoint: str) -> str:
    """Marker namespace for one checkpoint GENERATION: a hash of the
    FULL checkpoint path. The basename alone collides — two jobs with
    checkpoints .../events/ckpt and .../dedup/ckpt appending to the
    same warehouse would share run_id 'ckpt' and silently skip each
    other's epochs (r10 review finding). Epoch ids are only stable
    within one checkpoint generation, so a caller who WIPES a
    checkpoint dir but reuses its path must also clear the warehouse's
    ``_epochs/`` namespace (wiping the checkpoint already forfeits the
    source offsets, so the warehouse needs reconciliation anyway)."""
    import hashlib

    return hashlib.sha256(checkpoint.rstrip("/").encode()).hexdigest()[:12]


def _epoch_committed(spark: SparkSession, marker: str) -> bool:
    """Marker existence via the Hadoop FS API — works for any warehouse
    scheme, not just local paths (ADVICE r9: driver-local os.path checks
    silently broke the restart guard for object-store warehouses)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(marker)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def _commit_epoch(spark: SparkSession, marker: str) -> None:
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(marker)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    # create() makes parent dirs and truncates if present — idempotent
    fs.create(path, True).close()


def stream_events_to_warehouse(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint: str | None = None,
    landing: str | None = None,
) -> None:
    """foreachBatch append sink into the month-partitioned warehouse —
    the streaming twin of the batch incremental-append path.

    Epoch idempotence: foreachBatch is at-least-once (an epoch can be
    re-delivered after a restart), and a plain append would duplicate
    its rows — dynamic partition overwrite does NOT apply to append
    mode, so it cannot save this shape. Each committed epoch therefore
    leaves a marker under ``_epochs/``; a re-delivered epoch is skipped.
    A checkpoint keeps epoch ids stable across restarts (without it a
    restarted query renumbers from 0 and the markers are meaningless)
    — so restart safety requires the CALLER to pass a stable
    ``checkpoint``: a restarted job that reuses its checkpoint resumes
    the same run_id and skips every already-marked epoch. Calls that
    omit it get a fresh checkpoint (one-shot semantics: the guard only
    protects against re-delivery WITHIN that single run). Marker I/O
    goes through the Hadoop FS API so the guard holds for object-store
    warehouse paths, not just local disk (ADVICE r9). The marker
    commits AFTER the append, so the one remaining failure window
    (crash between append and marker) re-appends a single batch
    — at-least-once, converged by the MERGE sink variant
    ([[stream_upsert_to_warehouse]]) when duplicates are unacceptable."""
    import os

    # a restartable caller must also pin the LANDING zone: the source
    # path is baked into the checkpoint, so a restart that re-staged a
    # fresh landing dir could never resume its offsets.
    events = read_events_stream(spark, landing or stage_landing_dir(sf_dir))
    ckpt = checkpoint or _tmpdir("events_wh_ckpt_")
    # markers are scoped to the checkpoint generation: epoch ids are
    # only stable WITHIN one checkpoint, so a fresh query (new ckpt)
    # must not collide with a previous generation's epoch 0.
    run_id = _marker_run_id(ckpt)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        marker = _epoch_marker_path(out_path, run_id, epoch_id)
        if _epoch_committed(spark, marker):
            return
        (
            batch_df.withColumn("ym", month_partition("ts"))
            .write.mode("append")
            .partitionBy("ym")
            .parquet(out_path)
        )
        _commit_epoch(spark, marker)

    q = (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    record_progress(q)


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping (sliding) event-time windows: every event lands in
    ``window/slide`` windows. Same streaming/batch-portable plan shape
    as the tumbling variant."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").alias("window_start"), "event_type", "cnt")
    )


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    landing = stage_landing_dir(sf_dir)
    agg = tumbling_window_counts(read_events_stream(spark, landing))
    return run_available_now(
        agg, spark, drain_partitions=drain_partitions_for(landing)
    ).orderBy("window_start", "event_type")


def run_available_now_snapshot(
    stream_df: DataFrame,
    spark: SparkSession,
    table_dir: str,
    drain_partitions: int | None = None,
    checkpoint: str | None = None,
) -> None:
    """Production drain for COMPLETE-mode aggregates: every micro-batch
    emits the FULL current result, so the right warehouse shape is a
    SNAPSHOT table, not an append log — each epoch becomes the next
    immutable version of the versioned warehouse
    (:func:`..warehouse.write_versioned`: parquet snapshot + atomic
    pointer flip), and readers always see exactly one complete,
    committed result. Idempotent by construction — a re-delivered
    epoch just writes another identical snapshot and flips the pointer
    to it, so no ``_epochs`` markers are needed, and a crash mid-write
    leaves the pointer on the previous complete snapshot (never a
    half-written table, the failure the plain overwrite-per-epoch
    drain cannot exclude).

    Scope limits (r10 review): the versioned-warehouse helpers are
    driver-local-filesystem implementations (``os.listdir`` /
    ``os.replace`` pointer flips), so a URI ``table_dir`` is rejected
    up front instead of silently writing the pointer to a bogus local
    path — porting the pointer flip to the Hadoop FS create-and-rename
    API is what an object-store deployment needs. Vacuuming runs ONCE
    after the drain completes (keep=2), not per epoch: a per-epoch
    vacuum gave concurrent readers a retention window of only ~2
    micro-batch intervals before their resolved snapshot was deleted
    under them. Disk during the drain is bounded by result size ×
    epochs — small by definition for the complete-mode aggregates this
    sink exists for."""
    from ..warehouse import vacuum_versions, write_versioned

    if "://" in table_dir:
        raise ValueError(
            f"run_available_now_snapshot: versioned snapshot tables are "
            f"local-filesystem only (got {table_dir!r}); the pointer flip "
            "uses os.replace — see the docstring's scope note"
        )
    ckpt = checkpoint or _tmpdir("stream_snap_ckpt_")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_versioned(batch_df, table_dir)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(
            STREAM_DRAIN_PARTITIONS
            if drain_partitions is None
            else drain_partitions
        ),
    )
    try:
        q = (
            stream_df.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_progress(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    vacuum_versions(table_dir, keep=2)


def q_stream_tumbling_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-sink twin of [[q_stream_tumbling]] (r9 verdict task
    7): the complete-mode windowed aggregate drains into a VERSIONED
    snapshot table — each epoch an immutable ``v{N}`` + atomic pointer
    flip, readers never observe a partial result — and the declared
    output is the batch read-back of the final committed snapshot.
    Same oracle as the memory-sink form: the warehouse round-trip must
    change nothing."""
    from ..warehouse import current_version, read_versioned

    landing = stage_landing_dir(sf_dir)
    agg = tumbling_window_counts(read_events_stream(spark, landing))
    table_dir = _tmpdir("stream_tumbling_snap_")
    run_available_now_snapshot(
        agg, spark, table_dir, drain_partitions=drain_partitions_for(landing)
    )
    if current_version(table_dir) < 0:
        # empty landing → zero epochs → unborn table: the declared
        # relation is the (empty) aggregate schema, not a read error
        return spark.createDataFrame([], agg.schema)
    return read_versioned(spark, table_dir).orderBy("window_start", "event_type")


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    landing = stage_landing_dir(sf_dir)
    agg = sliding_window_counts(read_events_stream(spark, landing))
    return run_available_now(
        agg, spark, drain_partitions=drain_partitions_for(landing)
    ).orderBy("window_start", "event_type")


def stream_stream_conversion_join(
    clicks: DataFrame, purchases: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    each purchase matched to same-user clicks in the preceding
    ``within``. Both sides carry watermarks so the join state is
    bounded — Spark evicts click state older than the range + watermark
    (the canonical conversion-attribution join shape).

    Output: (purchase_id, click_id, user_id) — works identically on
    batch frames (the oracle path)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", "2 hours")
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", "2 hours")
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {within}")),
        "inner",
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases ⨝ preceding-hour clicks per user, on the real streaming
    engine (two stream readers over the same landing dir)."""
    landing = stage_landing_dir(sf_dir)
    clicks = read_events_stream(spark, landing).where(F.col("event_type") == "click")
    purchases = read_events_stream(spark, landing).where(
        F.col("event_type") == "purchase"
    )
    joined = stream_stream_conversion_join(clicks, purchases)
    out = run_available_now(
        joined,
        spark,
        output_mode="append",
        drain_partitions=drain_partitions_for(landing),
    )
    return out.orderBy("purchase_id", "click_id")


ORACLES: dict[str, str] = {
    # batch-equivalent of the streaming tumbling window: epoch-aligned
    # 1h windows == date_trunc('hour').
    "q_stream_tumbling": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(1)::BIGINT AS cnt,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    # sliding 1h/30min: each event belongs to the window starting at its
    # 30-min bucket and the one 30 minutes earlier (epoch-aligned, same
    # alignment Spark uses).
    "q_stream_sliding": """
        WITH expanded AS (
            SELECT TIMESTAMP '1970-01-01'
                     + ((floor(epoch(ts))::BIGINT // 1800) * 1800 - i * 1800)
                       * INTERVAL 1 SECOND AS window_start,
                   event_type
            FROM events, range(2) t(i)
        )
        SELECT window_start, event_type, count(1)::BIGINT AS cnt
        FROM expanded
        GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
}

ORACLES["q_stream_join"] = """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
    ORDER BY purchase_id, click_id
"""

QUERIES = {
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_tumbling_warehouse": q_stream_tumbling_warehouse,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_join": q_stream_join,
}

# SHARED-ORACLE PIN: the snapshot round-trip must change NOTHING about
# the result, so the twins deliberately reference ONE oracle string —
# an edit to q_stream_tumbling's oracle applies to BOTH twins by
# construction. If the twins' semantics ever diverge, give each its own
# string; do not edit the shared one for a single twin.
ORACLES["q_stream_tumbling_warehouse"] = ORACLES["q_stream_tumbling"]


def stage_landing_dir_with_redelivery(sf_dir: str) -> str:
    """Landing zone where the SAME weekly file arrives twice (the
    at-least-once delivery failure mode: upstream retries re-drop a
    file it already delivered). For the ≤3-file staging the fixtures
    use (one part per copy), files_per_trigger keeps the two copies in
    SEPARATE micro-batches, so the duplicate set crosses a batch
    boundary and only cross-batch state can catch it. A multi-part
    fixture at scale may co-batch a part with its redelivered copy
    (files_per_trigger = ceil(n/target) groups several files per
    trigger) — results stay correct either way; the cross-batch
    state-survival guarantee is pinned by the small-staging tests."""
    landing = _tmpdir("events_redelivered_")
    _copy_events_fixture(sf_dir, landing, "events_a.parquet")
    _copy_events_fixture(sf_dir, landing, "events_b.parquet")
    return landing


def stream_exact_dedup(events: DataFrame) -> DataFrame:
    """Exactly-once ingestion: key-based streaming dedup across
    micro-batches via ``dropDuplicates`` state. Unbounded state by
    design — the deterministic choice when re-delivery can be
    arbitrarily late (the fixture replays a whole historical file, so
    every event is "late"). Production variant for bounded lateness:
    ``dropDuplicatesWithinWatermark`` evicts keys older than the
    watermark, trading state size for a dup-leak window; with ~1e9
    keys/day a 1-day watermark holds ~8 GB of key state per 1000
    executors — fine; unbounded state is the thing to cap."""
    return events.dropDuplicates(["event_id"])


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type profile of the deduplicated stream: a redelivered file
    must leave counts and value sums exactly as if delivered once.

    The profile aggregate runs INSIDE the stream (chained stateful
    operators — dedup state feeding aggregation state, supported on
    this build and exercised here on purpose), so the memory sink
    holds 5 profile rows instead of every surviving event. Round-8
    measurement: the drained-rows form materialized all 10M deduped
    events into the driver sink at 100× (52s); stream-side aggregation
    is the production shape AND removes the harness cost."""
    landing = stage_landing_dir_with_redelivery(sf_dir)
    events = read_events_stream(spark, landing)
    agg = (
        stream_exact_dedup(events)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("string").cast("double").alias("total_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )
    out = run_available_now(
        agg,
        spark,
        output_mode="complete",
        drain_partitions=drain_partitions_for(landing),
    )
    return out.orderBy("event_type")


# the oracle reads the file ONCE — streaming dedup of the double
# delivery must reproduce the single-delivery profile bit-for-bit.
ORACLES["q_stream_dedup"] = """
    SELECT event_type, count(1)::BIGINT AS cnt,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value,
           min(event_id)::BIGINT AS min_event_id,
           max(event_id)::BIGINT AS max_event_id
    FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_stream_dedup"] = q_stream_dedup


def run_available_now_to_parquet(
    stream_df: DataFrame,
    spark: SparkSession,
    out_path: str,
    partition_by: str | None = None,
    drain_partitions: int | None = None,
    checkpoint: str | None = None,
    output_mode: str = "append",
) -> None:
    """Production drain for ROW-LEVEL streams: foreachBatch appends each
    micro-batch to a parquet warehouse path — rows flow executor→disk
    and never ride the driver. The memory sink (:func:`run_available_now`)
    is the right harness for small aggregates (5 profile rows) but
    materializes the WHOLE result in driver heap; for a row-preserving
    stream at 100× that is a 10M-row driver materialization (52 s
    measured, PLANS.md r8 honesty note) that no production deployment
    pays. foreachBatch is at-least-once under restarts, so each
    committed epoch leaves the same ``_epochs/`` marker
    [[stream_events_to_warehouse]] documents as required — a
    re-delivered epoch is skipped instead of double-appended. Restart
    safety requires the CALLER to pass a stable ``checkpoint``: epoch
    ids (and this guard's run_id) are only stable within one checkpoint
    generation, so a restart that minted a fresh checkpoint could never
    match a prior run's markers (ADVICE r9 — the guard was dead code
    for every caller until this parameter existed). The declared-query
    callers stay one-shot into fresh temp warehouses, where the guard
    only covers re-delivery within the single run. Marker I/O uses the
    Hadoop FS API so the guard holds for object-store paths."""
    import os

    ckpt = checkpoint or _tmpdir("stream_pq_ckpt_")
    run_id = _marker_run_id(ckpt)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        marker = _epoch_marker_path(out_path, run_id, epoch_id)
        if _epoch_committed(spark, marker):
            return
        w = batch_df.write.mode("append")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(out_path)
        _commit_epoch(spark, marker)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(
            STREAM_DRAIN_PARTITIONS
            if drain_partitions is None
            else drain_partitions
        ),
    )
    try:
        q = (
            # output_mode must match the stream's stateful operator
            # declaration (update for applyInPandasWithState update
            # emissions); the sink itself always parquet-APPENDS each
            # batch's emitted rows.
            stream_df.writeStream.outputMode(output_mode)
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_progress(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def q_stream_dedup_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-sink twin of [[q_stream_dedup]] (r8 verdict item 7):
    the ROW-LEVEL deduped stream drains via foreachBatch into a
    partitioned parquet warehouse (distributed executor-side writes),
    and the profile aggregate runs in BATCH over the read-back — the
    shape that actually ships surviving rows at 100 TB. Same redelivered
    landing zone, same single-delivery oracle; what changes is where
    the row volume goes: q_stream_dedup aggregates inside the stream so
    only 5 rows cross the sink, while this twin pays the full row-level
    sink cost in the engine (parquet) instead of the harness (driver
    memory). tools/stream_state_profile.py measures the two sink paths
    side by side at 100×."""
    landing = stage_landing_dir_with_redelivery(sf_dir)
    events = read_events_stream(spark, landing)
    out_path = _tmpdir("stream_dedup_wh_")
    deduped = stream_exact_dedup(events)
    run_available_now_to_parquet(
        deduped,
        spark,
        out_path,
        partition_by="event_type",
        drain_partitions=drain_partitions_for(landing),
    )
    # explicit schema: an empty landing zone drains ZERO files, and a
    # schema-less read of an empty warehouse dir cannot infer one
    back = spark.read.schema(deduped.schema).parquet(out_path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("string").cast("double").alias("total_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


# SHARED-ORACLE PIN: identical single-delivery profile contract as
# q_stream_dedup — the warehouse round-trip must change NOTHING about
# the result, so an edit to q_stream_dedup's oracle applies to BOTH
# twins by construction. If the twins' semantics ever diverge, give
# each its own string; do not edit the shared one for a single twin.
ORACLES["q_stream_dedup_warehouse"] = ORACLES["q_stream_dedup"]
QUERIES["q_stream_dedup_warehouse"] = q_stream_dedup_warehouse


def stream_watermarked_dedup(events: DataFrame, delay: str = "36500 days") -> DataFrame:
    """The BOUNDED-state production dedup: ``dropDuplicatesWithinWatermark``
    evicts key state once the event-time watermark passes it, capping
    state at (dup-arrival window × key rate) instead of the key
    universe — the 100 TB/day shape, where [[stream_exact_dedup]]'s
    unbounded ``dropDuplicates`` state grows without limit. The cost is
    a documented dup-leak window: a duplicate arriving later than
    ``delay`` after the original is no longer in state and passes.

    The default delay exceeds the fixture's whole event-time span, so
    the declared query keeps EXACTLY the single-delivery semantics the
    oracle checks (nothing is ever late, no state is evicted before the
    drain ends) while exercising the watermark-evicted operator and its
    state-store plumbing end-to-end — the eviction behavior itself is
    a function of Spark's watermark bookkeeping, deterministic only
    per-micro-batch-split, so the gate pins the semantics at the
    no-eviction point and the delay knob is the production control."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redelivered-file profile through the watermark-bounded dedup —
    must match the single-delivery profile bit-for-bit (same oracle
    shape as [[q_stream_dedup]]; different checked column names so the
    two queries can never be silently swapped)."""
    landing = stage_landing_dir_with_redelivery(sf_dir)
    events = read_events_stream(spark, landing)
    # stream-side aggregate, same rationale as q_stream_dedup: the sink
    # holds 5 profile rows, not every surviving event.
    agg = (
        stream_watermarked_dedup(events)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("string").cast("double").alias("sum_value"),
        )
    )
    out = run_available_now(
        agg,
        spark,
        output_mode="complete",
        drain_partitions=drain_partitions_for(landing),
    )
    return out.orderBy("event_type")


ORACLES["q_stream_dedup_watermark"] = """
    SELECT event_type, count(1)::BIGINT AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_stream_dedup_watermark"] = q_stream_dedup_watermark


def stream_static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch joins against a *batch*
    dimension — no state, no watermark needed (the static side is
    re-resolved per batch, so a warehouse dim refresh is picked up
    mid-stream). The planner broadcasts the dim under AQE exactly as
    in batch; this is the canonical enrichment shape before any
    stateful op, and the cheap half of what ``stream_stream_
    conversion_join`` does with state."""
    return events.join(dim, events.user_id == dim.c_custkey, "inner")


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stream enriched with the static customer dim, rolled up
    per (nation, event_type) — counts + exact value sums."""
    from ..tables import load_table

    landing = stage_landing_dir(sf_dir)
    events = read_events_stream(spark, landing)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    enriched = stream_static_enrich(events, dim)
    agg = enriched.groupBy("c_nationkey", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("string").cast("double").alias("total_value"),
    )
    return run_available_now(
        agg, spark, drain_partitions=drain_partitions_for(landing)
    ).orderBy("c_nationkey", "event_type")


ORACLES["q_stream_static_join"] = """
    SELECT c.c_nationkey, e.event_type, count(1)::BIGINT AS cnt,
           CAST(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_nationkey, e.event_type
    ORDER BY c.c_nationkey, e.event_type
"""

QUERIES["q_stream_static_join"] = q_stream_static_join

#: benched streaming drains (VERDICT r3 item 6): full micro-batch
#: execution — landing-dir staging, AvailableNow trigger, state store,
#: memory-sink drain — so trigger-latency regressions land in
#: BENCH_r{N}.json. q_session_window (streaming.stateful) is benched
#: from its own module.
BENCH = [
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_join",
    # exactly-once two-phase drain (bench coverage is guaranteed by the
    # registry top-up; this entry orders the sweep)
    "q_stream_checkpoint_resume",
]


def _recover_interrupted_swap(out_path: str) -> None:
    """Self-heal the stage-and-swap sink after a crash (ADVICE r4).

    The swap in :func:`stream_upsert_to_warehouse` is
    ``rename(out_path, __old_e)`` then ``rename(__epoch_e, out_path)``;
    a crash between the two leaves ``out_path`` missing with the full
    history sitting in the ``__old_e`` aside dir — and a naive restart
    would silently rebuild the snapshot from a single micro-batch. On
    sink start, restore the newest aside dir to ``out_path`` if the
    live snapshot is missing (the interrupted batch re-merges via
    at-least-once redelivery), then sweep stale aside/staged dirs.
    """
    import os
    import re
    import shutil

    parent = os.path.dirname(out_path) or "."
    base = os.path.basename(out_path)
    if not os.path.isdir(parent):
        return
    leftovers: dict[str, list[tuple[int, str]]] = {"old": [], "epoch": []}
    for entry in os.listdir(parent):
        m = re.fullmatch(re.escape(base) + r"\.__(old|epoch)_(\d+)", entry)
        if m:
            leftovers[m.group(1)].append((int(m.group(2)), os.path.join(parent, entry)))
    if not os.path.isdir(out_path) and leftovers["old"]:
        # crash landed inside the swap window: bring the newest aside
        # snapshot back live before anything merges against nothing.
        _, newest = max(leftovers["old"])
        os.rename(newest, out_path)
    for _, path in leftovers["old"] + leftovers["epoch"]:
        if os.path.isdir(path):
            shutil.rmtree(path)


def stream_upsert_to_warehouse(
    spark: SparkSession,
    landing_dir: str,
    out_path: str,
    keys: list[str] | None = None,
) -> None:
    """foreachBatch MERGE sink: each micro-batch upserts into the
    warehouse snapshot by key — the streaming CDC-apply pattern
    (late re-deliveries and corrections overwrite their earlier rows
    instead of appending duplicates, so the sink converges to exactly
    one row per key no matter how many times the feed re-sends).

    Pattern: inside foreachBatch the micro-batch is a plain batch
    DataFrame, so the sink composes the batch
    :func:`~..operators.merge.merge_upsert` with a stage-and-swap
    write (write the merged snapshot to a temp dir, atomically rename
    over the live one) — exactly-once per epoch without a
    transactional table format. (warehouse.write_versioned's pointer
    flip is the windowless alternative when consumers can read through
    read_versioned; this sink keeps out_path a plain parquet dir, so
    it pays the two-rename swap plus the startup self-heal below.) Within-batch duplicates collapse to
    the latest row by (ts, event_id) before the merge, mirroring the
    CDC latest-wins rule. Spark cannot express this as a native
    streaming sink (no MERGE target); foreachBatch is the documented
    escape hatch and keeps everything JVM-side."""
    import os
    import shutil

    from pyspark.sql import Window

    from ..operators.merge import merge_upsert

    keys = keys or ["event_id"]
    _recover_interrupted_swap(out_path)
    events = read_events_stream(spark, landing_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # within-batch latest-wins via the shared change-log compactor.
        # The tiebreak must TOTALLY order each key's rows: event_id is
        # the partition key itself (constant within a partition), so
        # two same-key corrections with identical ts need a content
        # hash to resolve deterministically — otherwise the kept row is
        # shuffle-dependent (identical-content duplicates tie safely:
        # any winner is the same row).
        from ..operators.merge import latest_per_key

        latest = latest_per_key(
            batch_df.withColumn(
                "__content", F.md5(F.to_json(F.struct(*batch_df.columns)))
            ),
            keys,
            ["ts", "__content"],
        ).drop("__content")
        if os.path.isdir(out_path):
            base = spark.read.parquet(out_path)
            merged = merge_upsert(base, latest.select(*base.columns), keys)
        else:
            merged = latest
        staged = f"{out_path}.__epoch_{epoch_id}"
        merged.write.mode("overwrite").parquet(staged)
        # swap via rename-aside, never delete-then-rename: a crash
        # between rmtree and rename would destroy the live snapshot
        # (the next run would silently rebuild from one micro-batch).
        # Worst crash here leaves BOTH the old snapshot (aside) and
        # the staged epoch on disk — recoverable, never empty.
        old = f"{out_path}.__old_{epoch_id}"
        if os.path.isdir(out_path):
            os.rename(out_path, old)
        os.rename(staged, out_path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    q = events.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    record_progress(q)


def stream_drain_with_checkpoint(
    spark: SparkSession, landing_dir: str, out_path: str, checkpoint_dir: str
) -> None:
    """One AvailableNow drain of the landing dir into a parquet SINK
    with a checkpoint: source offsets (which files are consumed) and
    sink commits (_spark_metadata) both persist, so a later drain with
    the SAME checkpoint processes only files that arrived since — the
    exactly-once restart discipline every production stream runs with,
    which the ephemeral memory-sink drains above deliberately skip."""
    q = (
        read_events_stream(spark, landing_dir)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    record_progress(q)


def _stage_half(sf_dir: str, landing: str, parity: int, name: str) -> None:
    """Write the events with event_id % 2 == parity as one landing file
    via pyarrow (byte-preserving: the nanosecond ts column keeps its
    physical type, so the stream's schema probe sees the same file
    shape the real feed delivers)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    half = t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), parity))
    # version 2.6 explicitly: older pyarrow defaults (2.4) cannot write
    # TIMESTAMP(NANOS) and would coerce/raise, changing the staged
    # file's physical type away from the feed's (same guard as
    # tables.nanos_arrival_type's probe writer). Footer metadata is
    # STRIPPED: a source fixture previously written by Spark embeds
    # row metadata (org.apache.spark.sql.parquet.row.metadata) that
    # the schema probe would trust OVER the physical type — for an
    # INT64-nanos column it declares TimestampType, which the
    # vectorized reader then cannot produce (FAILED_READ_FILE on the
    # first drain; found by the 4× full-bench run). A landing feed's
    # contract is the file's physical+logical shape, not a previous
    # engine's embedded metadata.
    pq.write_table(
        half.replace_schema_metadata(None), f"{landing}/{name}", version="2.6"
    )


def q_stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed restart: drain half the feed, then deliver the
    second half and drain again REUSING the checkpoint. Offset tracking
    must skip the already-consumed file — if the restart re-processed
    it, every even-id event would appear twice and the per-type profile
    below would double away from the single-delivery oracle."""
    landing = _tmpdir("events_ckpt_landing_")
    base = _tmpdir("events_ckpt_")
    out, ckpt = f"{base}/out", f"{base}/checkpoint"

    _stage_half(sf_dir, landing, 0, "half_even.parquet")
    stream_drain_with_checkpoint(spark, landing, out, ckpt)
    _stage_half(sf_dir, landing, 1, "half_odd.parquet")
    stream_drain_with_checkpoint(spark, landing, out, ckpt)

    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("string").cast("double").alias("total_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


# single-delivery profile: a restart that re-reads consumed files would
# double cnt/total_value and fail the hash.
ORACLES["q_stream_checkpoint_resume"] = """
    SELECT event_type, count(1)::BIGINT AS cnt,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value,
           min(event_id)::BIGINT AS min_event_id,
           max(event_id)::BIGINT AS max_event_id
    FROM events GROUP BY event_type ORDER BY event_type
"""
QUERIES["q_stream_checkpoint_resume"] = q_stream_checkpoint_resume


# ---------------------------------------------------------------------------
# stream-side dead-letter: malformed NDJSON quarantined IN the stream
# ---------------------------------------------------------------------------

#: planted-corruption selector for the NDJSON landing zone: lines whose
#: event_id % this == 0 are truncated mid-object (always unparseable —
#: the prefix never closes the JSON object), ~1% of the feed, the
#: steady malformed-record rate a real collector emits.
JSON_CORRUPT_MOD = 97
#: truncation point: inside (or just past) the event_id number of the
#: serialized object — structurally invalid at ANY event_id width.
JSON_CORRUPT_BYTES = 20


def stage_ndjson_landing_with_corruption(spark: SparkSession, sf_dir: str) -> str:
    """NDJSON landing zone with PLANTED malformed lines: every event
    serializes to one JSON object (event_id, user_id, event_type,
    value — event time stays out of the quarantine fixture so the
    corruption plant, not timestamp formats, is the variable), and the
    ``event_id % JSON_CORRUPT_MOD == 0`` lines are truncated to their
    first ``JSON_CORRUPT_BYTES`` bytes. Deterministic, so the DuckDB
    oracle re-derives exactly which rows dead-letter."""
    from ..tables import load_table

    landing = _tmpdir("events_json_landing_")
    events = load_table(spark, sf_dir, "events")
    # ignoreNullFields=false: to_json would otherwise DROP null fields,
    # and a row whose non-id fields are all null could serialize short
    # enough that the truncation prefix is a complete valid object —
    # the plant must be structurally invalid for every possible row,
    # not by fixture luck. With explicit nulls every line starts
    # '{"event_id":...,"user_id":' and always exceeds the cut.
    # fixture invariant the oracle's equivalence rests on: a NaN/Inf
    # value would serialize as an unparseable JSON token and dead-letter
    # on the Spark side only, while the oracle (which replays the plant
    # on the parquet source) would count the row clean. Assert it here
    # so a regenerated fixture breaks LOUDLY at staging, not as an
    # inscrutable hash mismatch (ADVICE r9).
    n_unserializable = events.where(
        F.isnan(F.col("value")) | (F.abs(F.col("value")) == float("inf"))
    ).count()
    if n_unserializable:
        raise ValueError(
            f"events fixture has {n_unserializable} NaN/Inf value rows — "
            "these cannot round-trip NDJSON and would silently diverge "
            "from the quarantine oracle"
        )
    line = F.to_json(
        F.struct("event_id", "user_id", "event_type", "value"),
        {"ignoreNullFields": "false"},
    )
    (
        events.select(
            F.when(
                F.col("event_id") % JSON_CORRUPT_MOD == 0,
                F.substring(line, 1, JSON_CORRUPT_BYTES),
            )
            .otherwise(line)
            .alias("value")
        )
        # multiple part files so trigger sizing and multi-batch state
        # survival are exercised, not a single-batch degenerate drain
        .coalesce(4)
        .write.mode("overwrite")
        .text(landing)
    )
    return landing


def read_json_stream_quarantine(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming twin of
    [[tfl_bikes_data_pipeline_spark.sources.raw.read_json_quarantine]]:
    a file-source NDJSON stream in PERMISSIVE mode with an explicit
    schema plus ``_corrupt_record`` — records that fail to parse ride
    the stream as dead-letter rows (typed fields null, raw line
    preserved) instead of killing the query. A collector feed at
    100 TB/day ALWAYS contains malformed lines; the stream must
    account for them, not die on batch 7,000."""
    ensure_runtime_confs(spark)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger(landing_dir))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(landing_dir)
    )


def q_stream_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type profile of a streamed NDJSON feed with ~1% PLANTED
    malformed lines: clean rows aggregate under their event_type,
    dead-letter rows under the ``_corrupt`` bucket — so the result
    proves in one relation that the stream (a) survived every corrupt
    line, (b) quarantined exactly the planted ones (the oracle
    re-derives the ``event_id % JSON_CORRUPT_MOD`` split), and (c) lost
    nothing else (per-type counts/sums/id-ranges of the clean rows are
    value-hashed). Aggregation runs INSIDE the stream, so the sink
    holds |event_type|+1 rows at any scale."""
    landing = stage_ndjson_landing_with_corruption(spark, sf_dir)
    stream = read_json_stream_quarantine(spark, landing)
    # bucket on the PERMISSIVE parser's own dead-letter signal, not on
    # event_type nullness: a clean row with a null event_type must
    # aggregate under its (null) type key exactly as the oracle does,
    # not get folded into the quarantine bucket (ADVICE r9).
    agg = (
        stream.groupBy(
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("_corrupt"))
            .otherwise(F.col("event_type"))
            .alias("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("string").cast("double").alias("total_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )
    out = run_available_now(
        agg,
        spark,
        output_mode="complete",
        drain_partitions=drain_partitions_for(landing),
    )
    return out.orderBy("event_type")


# the oracle replays the corruption plant on the parquet source: the
# planted lines contribute a '_corrupt' bucket with null value/id
# bounds (their typed fields never parsed), everything else aggregates
# exactly as delivered.
ORACLES["q_stream_json_quarantine"] = f"""
    WITH tagged AS (
        SELECT CASE WHEN event_id % {JSON_CORRUPT_MOD} = 0
                    THEN '_corrupt' ELSE event_type END AS event_type,
               CASE WHEN event_id % {JSON_CORRUPT_MOD} = 0
                    THEN NULL ELSE value END AS value,
               CASE WHEN event_id % {JSON_CORRUPT_MOD} = 0
                    THEN NULL ELSE event_id END AS eid
        FROM events
    )
    SELECT event_type, count(1)::BIGINT AS cnt,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value,
           min(eid)::BIGINT AS min_event_id,
           max(eid)::BIGINT AS max_event_id
    FROM tagged GROUP BY event_type ORDER BY event_type
"""
QUERIES["q_stream_json_quarantine"] = q_stream_json_quarantine
