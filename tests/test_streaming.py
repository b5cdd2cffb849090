"""Streaming layer: watermark/late-data semantics and the foreachBatch
warehouse sink — behaviors the batch oracle can't check."""

import os
import tempfile

from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.streaming.jobs import (
    stream_events_to_warehouse,
    tumbling_window_counts,
)


def test_foreachbatch_warehouse_sink_matches_batch(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="stream_warehouse_")
    stream_events_to_warehouse(spark, sf_dir, out)
    back = spark.read.parquet(out)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert back.count() == batch.count()
    # month partition directories exist (landing layout parity)
    assert any(p.startswith("ym=") for p in os.listdir(out))


def test_watermark_drops_late_rows_in_append_mode(spark):
    """Two files processed as successive micro-batches in one
    availableNow run (maxFilesPerTrigger=1, file order by mtime):
    batch 1 advances the watermark far ahead; batch 2's too-late row
    must be discarded from streaming state in append mode."""
    import time
    from datetime import datetime

    landing = tempfile.mkdtemp(prefix="late_landing_")

    def write_batch(name, rows):
        rows = [(datetime.fromisoformat(t), k) for t, k in rows]
        spark.createDataFrame(rows, "ts timestamp, k string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{landing}/{name}")

    # batch 1: on-time rows; 06:00 pushes the watermark to 05:00
    write_batch("b1", [("2024-01-01 00:30:00", "a"), ("2024-01-01 06:00:00", "a")])
    time.sleep(1.1)  # distinct mtimes so each file is its own micro-batch
    # batch 2: advances time further; eviction of the 00:00 window (end
    # 01:00 < watermark 05:00) happens in this batch → emits cnt=1
    write_batch("b2", [("2024-01-01 07:00:00", "a")])
    time.sleep(1.1)
    # batch 3: a row hours behind the watermark, targeting the already-
    # finalized 00:00 window → must be dropped, not re-emitted
    write_batch("b3", [("2024-01-01 00:45:00", "a")])

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{landing}/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").alias("ws"), "k", "cnt")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM late_out").collect()
    hour0 = [r for r in emitted if r.ws.hour == 0]
    # the 00:00 window was finalized with cnt=1 before the late row
    # arrived; the late row must be dropped — exactly one emission,
    # count unchanged.
    assert len(hour0) == 1 and hour0[0].cnt == 1


def test_tumbling_counts_plan_works_on_batch_df(spark, sf_dir):
    """The same aggregation plan runs in batch mode (streaming/batch
    parity of the logical plan)."""
    from tfl_bikes_data_pipeline_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = tumbling_window_counts(events)
    total = out.agg(F.sum("cnt")).first()[0]
    assert total == events.count()


def test_stateful_counts_accumulate_across_batches(spark, sf_dir):
    """applyInPandasWithState: state must persist across micro-batches —
    users appearing in several batches emit several (growing) updates."""
    from tfl_bikes_data_pipeline_spark.streaming.jobs import run_available_now
    from tfl_bikes_data_pipeline_spark.streaming.stateful import (
        EVENTS_MICRO_SCHEMA,
        cumulative_user_counts,
        stage_landing_dir_split,
    )

    landing = stage_landing_dir_split(spark, sf_dir, n_files=3)
    stream = (
        spark.readStream.schema(EVENTS_MICRO_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    emissions = run_available_now(
        cumulative_user_counts(stream), spark, output_mode="update"
    )
    per_user = emissions.groupBy("user_id").count()
    assert per_user.where("count > 1").count() > 0, (
        "no user emitted twice — state never crossed a micro-batch boundary"
    )


def test_stream_defined_on_empty_landing_dir(spark):
    """The stream must be definable BEFORE the first file drop (the
    production order): an empty landing dir falls back to the static
    schema instead of failing the batch probe, and the normalized ts
    column is a session-TZ timestamp either way."""
    import tempfile

    from pyspark.sql import types as T

    from tfl_bikes_data_pipeline_spark.streaming.jobs import read_events_stream

    landing = tempfile.mkdtemp(prefix="events_empty_")
    stream = read_events_stream(spark, landing)
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)


def test_stream_on_missing_landing_dir_fails_fast(spark):
    """ONLY the empty-dir cannot-infer case may take the fallback
    schema: a typo'd landing path must raise at stream definition, not
    silently stream zero files against the fallback (ADVICE r3: the
    bare except also swallowed PATH_NOT_FOUND)."""
    import pytest
    from pyspark.errors import AnalysisException

    from tfl_bikes_data_pipeline_spark.streaming.jobs import read_events_stream

    with pytest.raises(AnalysisException):
        read_events_stream(spark, "/root/no/such/landing_dir")


def test_rocksdb_state_store_parity(spark, sf_dir):
    """The RocksDB state store (the bounded-memory provider for
    key-spaces that outgrow executor heap at scale) must produce
    byte-identical results to the default HDFS-backed provider on a
    stateful drain, and the conf must be restored afterwards."""
    from tfl_bikes_data_pipeline_spark import registry
    from tfl_bikes_data_pipeline_spark.streaming.jobs import rocksdb_state

    key = "spark.sql.streaming.stateStore.providerClass"
    base = {
        tuple(r) for r in registry.QUERIES["q_stream_tumbling"](spark, sf_dir).collect()
    }
    with rocksdb_state(spark):
        assert "RocksDB" in spark.conf.get(key)
        rocks = {
            tuple(r)
            for r in registry.QUERIES["q_stream_tumbling"](spark, sf_dir).collect()
        }
    try:
        restored = spark.conf.get(key)
    except Exception:
        restored = None
    assert restored is None or "RocksDB" not in restored
    assert rocks == base


def test_foreachbatch_upsert_sink_converges_under_redelivery(spark, sf_dir):
    """The streaming MERGE sink must converge to exactly one row per
    key even when the same file is delivered twice across micro-batch
    boundaries (at-least-once redelivery) — the property the plain
    append sink cannot provide."""
    from tfl_bikes_data_pipeline_spark.streaming.jobs import (
        stage_landing_dir_with_redelivery,
        stream_upsert_to_warehouse,
    )

    landing = stage_landing_dir_with_redelivery(sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="stream_upsert_"), "events_live")
    stream_upsert_to_warehouse(spark, landing, out)
    back = spark.read.parquet(out)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # one row per key despite 2x delivery
    assert back.count() == batch.count()
    assert back.select("event_id").distinct().count() == batch.count()
    # values survived the merge unchanged (latest-wins over identical
    # redelivered rows is the identity)
    assert (
        back.agg(F.sum(F.col("value").cast("decimal(18,6)"))).first()[0]
        == batch.agg(F.sum(F.col("value").cast("decimal(18,6)"))).first()[0]
    )


def test_upsert_sink_self_heals_interrupted_swap(spark, sf_dir):
    """Crash window between rename(out, __old_e) and rename(staged, out)
    leaves out_path missing with the history in the aside dir; a restart
    must restore the aside snapshot instead of silently rebuilding from
    a single micro-batch (ADVICE r4)."""
    from tfl_bikes_data_pipeline_spark.streaming.jobs import (
        stage_landing_dir_with_redelivery,
        stream_upsert_to_warehouse,
    )

    landing = stage_landing_dir_with_redelivery(sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="stream_upsert_crash_"), "events_live")
    stream_upsert_to_warehouse(spark, landing, out)
    full = spark.read.parquet(out)
    n_full, sum_full = full.count(), full.agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
    ).first()[0]

    # simulate the crash: live snapshot renamed aside, staged epoch left
    # half-swapped (a stale partial dir), out_path gone.
    os.rename(out, f"{out}.__old_7")
    os.makedirs(f"{out}.__epoch_7")

    stream_upsert_to_warehouse(spark, landing, out)
    back = spark.read.parquet(out)
    assert back.count() == n_full
    assert back.agg(F.sum(F.col("value").cast("decimal(18,6)"))).first()[0] == sum_full
    # leftovers swept
    parent = os.path.dirname(out)
    assert [e for e in os.listdir(parent) if "__old_" in e or "__epoch_" in e] == []


def test_checkpoint_resume_skips_consumed_files(spark, sf_dir):
    """Restarting a checkpointed drain must consume only files that
    arrived since the last run, and a restart with NO new files must be
    a no-op — source offsets + parquet-sink commit log together give
    exactly-once across restarts."""
    import tempfile as _tf

    from tfl_bikes_data_pipeline_spark.streaming.jobs import (
        _stage_half,
        stream_drain_with_checkpoint,
    )

    landing = _tf.mkdtemp(prefix="ckpt_landing_")
    base = _tf.mkdtemp(prefix="ckpt_base_")
    out, ckpt = f"{base}/out", f"{base}/ckpt"

    _stage_half(sf_dir, landing, 0, "a.parquet")
    stream_drain_with_checkpoint(spark, landing, out, ckpt)
    n1 = spark.read.parquet(out).count()

    _stage_half(sf_dir, landing, 1, "b.parquet")
    stream_drain_with_checkpoint(spark, landing, out, ckpt)
    n2 = spark.read.parquet(out).count()

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    even = batch.where(F.col("event_id") % 2 == 0).count()
    assert n1 == even
    assert n2 == batch.count()

    # idle restart: nothing new → nothing processed
    stream_drain_with_checkpoint(spark, landing, out, ckpt)
    assert spark.read.parquet(out).count() == n2
    # and no duplicate event ids anywhere
    assert spark.read.parquet(out).select("event_id").distinct().count() == n2


def test_session_window_boundary_merges_exact_gap(spark):
    """Empirically pinned boundary rule (review r5): Spark's
    session_window MERGES two events exactly gap apart and splits at
    gap+1µs — and the corrected gap-island oracle must agree (the old
    '>=' oracle split at exactly-gap; µs-random fixtures masked it)."""
    import duckdb
    import pandas as pd

    from tests.oracle_utils import assert_matches_oracle
    from tfl_bikes_data_pipeline_spark import registry
    from tfl_bikes_data_pipeline_spark.streaming.stateful import session_windows

    rows = [
        (1, "2024-01-01 10:00:00", 10, 1.0),   # exactly 30 min later → merge
        (2, "2024-01-01 10:30:00", 10, 2.0),
        (3, "2024-01-01 11:00:00.000001", 10, 3.0),  # gap+1µs → split
        (4, "2024-01-01 10:00:00", 20, 4.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "value")

    got = session_windows(events)
    per_user = {(r.user_id, str(r.session_start)): r.n_events for r in got.collect()}
    assert per_user[(10, "2024-01-01 10:00:00")] == 2, per_user
    assert per_user[(10, "2024-01-01 11:00:00.000001")] == 1

    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], format="mixed"),
            "user_id": [r[2] for r in rows],
            "value": [r[3] for r in rows],
        }
    )
    con.register("events", pdf)
    assert_matches_oracle(
        got, con, registry.ORACLES["q_session_window"], "session_boundary"
    )


def test_files_per_trigger_targets_fixed_batch_count(tmp_path):
    """Scale-aware trigger sizing (round 8): batch count must stay
    ~STREAM_TARGET_BATCHES as the landing zone grows, with a floor of
    1 file/batch, and an empty/missing dir must not crash the
    stream-before-first-drop path."""
    from tfl_bikes_data_pipeline_spark.streaming.jobs import (
        STREAM_TARGET_BATCHES,
        files_per_trigger,
    )

    assert STREAM_TARGET_BATCHES == 3  # the semantics the suite pins

    def staged(n):
        d = tmp_path / f"landing_{n}"
        d.mkdir()
        for i in range(n):
            (d / f"part_{i}.parquet").write_bytes(b"")
        return str(d)

    # floor: tiny landing zones keep multi-batch state-survival semantics
    assert files_per_trigger(staged(0)) == 1
    assert files_per_trigger(staged(1)) == 1
    assert files_per_trigger(staged(3)) == 1
    # growth: batch count = ceil(n / fpt) stays in [target, target+1)
    for n in (10, 30, 100, 1000):
        fpt = files_per_trigger(staged(n))
        batches = -(-n // fpt)
        assert batches <= STREAM_TARGET_BATCHES, (n, fpt, batches)
    # missing dir → floor, not crash (stream defined before first drop)
    assert files_per_trigger(str(tmp_path / "nope")) == 1


def test_bucketed_stateful_counts_match_per_key_operator(spark, sf_dir):
    """The bucketed custom-state operator must land on the identical
    final per-user totals as the per-key operator (and the plain batch
    GROUP BY), across a genuinely multi-batch drain."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.streaming import jobs, stateful
    from tfl_bikes_data_pipeline_spark.tables import load_table

    landing = stateful.stage_landing_dir_split(spark, sf_dir, 3)
    stream = (
        spark.readStream.schema(stateful.EVENTS_MICRO_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    emissions = jobs.run_available_now(
        stateful.cumulative_user_counts_bucketed(stream),
        spark,
        output_mode="update",
    )
    got = {
        r.user_id: r.n_events
        for r in emissions.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_target_batches_env_parses_defensively(monkeypatch):
    """A bad SPARK_GRAFT_STREAM_TARGET_BATCHES must degrade to the
    documented behavior, not crash stream definition (r8 ADVICE): 0
    would divide-by-zero in files_per_trigger, negatives are
    meaningless ceilings, and junk must fall back to the default."""
    from tfl_bikes_data_pipeline_spark.streaming import jobs

    cases = {"0": 1, "-4": 1, "three": 3, "": 3, "7": 7, "3": 3}
    for raw, expect in cases.items():
        monkeypatch.setenv("SPARK_GRAFT_STREAM_TARGET_BATCHES", raw)
        assert jobs._target_batches_from_env() == expect, raw
    monkeypatch.delenv("SPARK_GRAFT_STREAM_TARGET_BATCHES")
    assert jobs._target_batches_from_env() == 3


def test_stream_json_quarantine_routes_planted_lines(spark, sf_dir):
    """The NDJSON stream must dead-letter EXACTLY the planted truncated
    lines (event_id % JSON_CORRUPT_MOD == 0) into the _corrupt bucket
    and aggregate every clean line under its event_type."""
    from tfl_bikes_data_pipeline_spark.streaming.jobs import (
        JSON_CORRUPT_MOD,
        q_stream_json_quarantine,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    n_corrupt = events.where(F.col("event_id") % JSON_CORRUPT_MOD == 0).count()
    n_total = events.count()
    out = {r.event_type: r for r in q_stream_json_quarantine(spark, sf_dir).collect()}
    assert "_corrupt" in out, "no dead-letter bucket emitted"
    assert out["_corrupt"].cnt == n_corrupt
    assert out["_corrupt"].total_value is None  # corrupt rows never parse fields
    assert out["_corrupt"].min_event_id is None
    assert sum(r.cnt for r in out.values()) == n_total, "rows lost or duplicated"


def test_epoch_marker_guard_is_live_with_stable_checkpoint(
    spark, sf_dir, monkeypatch
):
    """ADVICE r9: the epoch idempotency guard was dead code while every
    call minted a fresh checkpoint (run_id never matched a prior run's
    markers). With a caller-supplied stable checkpoint the guard must
    actually skip a pre-committed epoch — proven by planting epoch 0's
    marker up front and observing that batch's rows never land."""
    from tfl_bikes_data_pipeline_spark.streaming import jobs

    # pin the trigger policy: the test stages 3 fixture copies and
    # needs 3 micro-batches regardless of SPARK_GRAFT_STREAM_TARGET_BATCHES
    monkeypatch.setattr(jobs, "STREAM_TARGET_BATCHES", 3)
    # multi-file landing (3 copies of the fixture) => multi-epoch drain;
    # _copy_events_fixture handles both fixture layouts (single file or
    # directory of part files)
    landing = tempfile.mkdtemp(prefix="stream_guard_landing_")
    for i in range(3):
        jobs._copy_events_fixture(sf_dir, landing, f"events_{i}.parquet")
    out = tempfile.mkdtemp(prefix="stream_guard_wh_")
    ckpt = tempfile.mkdtemp(prefix="stream_guard_ckpt_")
    run_id = jobs._marker_run_id(ckpt)
    os.makedirs(os.path.join(out, "_epochs"), exist_ok=True)
    open(os.path.join(out, "_epochs", f"{run_id}-0"), "w").close()

    stream_events_to_warehouse(spark, sf_dir, out, checkpoint=ckpt, landing=landing)

    n_total = spark.read.parquet(landing).count()
    ym_dirs = [p for p in os.listdir(out) if p.startswith("ym=")]
    landed = spark.read.parquet(out).count() if ym_dirs else 0
    assert 0 < landed < n_total, (
        f"epoch-0 skip not visible: landed={landed}, staged={n_total}"
    )
    # the later epochs of the SAME run committed markers next to ours
    markers = os.listdir(os.path.join(out, "_epochs"))
    assert any(m != f"{run_id}-0" and m.startswith(run_id) for m in markers), (
        "no later epoch committed — the drain did not run multi-batch, "
        f"markers={markers}"
    )


def test_epoch_marker_guard_restart_appends_nothing(spark, sf_dir):
    """Restart with the SAME checkpoint and landing zone must not
    duplicate rows: the source offsets are already committed, and any
    re-delivered epoch hits its marker."""
    from tfl_bikes_data_pipeline_spark.streaming import jobs

    landing = tempfile.mkdtemp(prefix="stream_restart_landing_")
    jobs._copy_events_fixture(sf_dir, landing, "events.parquet")
    out = tempfile.mkdtemp(prefix="stream_restart_wh_")
    ckpt = tempfile.mkdtemp(prefix="stream_restart_ckpt_")
    stream_events_to_warehouse(spark, sf_dir, out, checkpoint=ckpt, landing=landing)
    n1 = spark.read.parquet(out).count()
    stream_events_to_warehouse(spark, sf_dir, out, checkpoint=ckpt, landing=landing)
    assert spark.read.parquet(out).count() == n1


def test_marker_run_id_distinguishes_same_basename_checkpoints():
    """r10 review: two jobs with checkpoints .../events/ckpt and
    .../dedup/ckpt sharing one warehouse must NOT share a marker
    namespace (the old basename-derived run_id made them skip each
    other's epochs)."""
    from tfl_bikes_data_pipeline_spark.streaming.jobs import _marker_run_id

    a = _marker_run_id("/srv/ckpts/events/ckpt")
    b = _marker_run_id("/srv/ckpts/dedup/ckpt")
    assert a != b
    assert _marker_run_id("/srv/ckpts/events/ckpt/") == a  # slash-insensitive
