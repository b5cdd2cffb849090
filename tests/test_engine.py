"""End-to-end engine façade: the reference's three stages over a temp
warehouse — setup overwrite, monthly append, idempotent re-run,
fact-dimension referential integrity."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.engine import run_stage
from tfl_bikes_data_pipeline_spark.tables import load_table


@pytest.fixture(scope="module")
def months(spark, sf_dir):
    evs = load_table(spark, sf_dir, "events")
    return sorted(
        r["m"] for r in evs.select(F.date_format("ts", "yyyyMM").alias("m")).distinct().collect()
    )


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, months):
    wh = tempfile.mkdtemp(prefix="engine_wh_")
    run_stage(spark, wh, "setup", sf_dir=sf_dir)
    for m in months[:2]:
        run_stage(spark, wh, "weather", month=m, sf_dir=sf_dir)
        run_stage(spark, wh, "journeys", month=m, sf_dir=sf_dir)
    return wh


def test_setup_builds_dimensions(spark, warehouse):
    dim_time = spark.read.parquet(f"{warehouse}/dim_time")
    assert dim_time.count() == 525600  # 2021, minute grain
    assert set(dim_time.columns) >= {"id", "timestamp", "year", "hour", "minute"}
    dim_loc = spark.read.parquet(f"{warehouse}/dim_locations")
    assert {"station_id", "lat", "lon", "grid_id", "dist2"} <= set(dim_loc.columns)


def test_monthly_append_accumulates_partitions(spark, warehouse, months):
    fact = spark.read.parquet(f"{warehouse}/fact_events")
    assert set(r["ym"] for r in fact.select("ym").distinct().collect()) == set(months[:2])


def test_month_rerun_is_idempotent(spark, sf_dir, warehouse, months):
    before = spark.read.parquet(f"{warehouse}/fact_events").count()
    run_stage(spark, warehouse, "journeys", month=months[0], sf_dir=sf_dir)
    after = spark.read.parquet(f"{warehouse}/fact_events").count()
    assert before == after


def test_fact_matches_month_slices(spark, sf_dir, warehouse, months):
    evs = load_table(spark, sf_dir, "events").where(
        F.date_format("ts", "yyyyMM").isin(months[:2])
    )
    fact = spark.read.parquet(f"{warehouse}/fact_events")
    assert fact.count() == evs.count()


def test_weather_ids_resolve_or_null(spark, warehouse):
    """Reference tolerance: missing observations leave a NULL id, present
    ones must resolve to the dimension (docs/3_data_transformation.md:32)."""
    fact = spark.read.parquet(f"{warehouse}/fact_events")
    dim = spark.read.parquet(f"{warehouse}/dim_weather").select(
        F.col("id").alias("weather_id")
    )
    dangling = (
        fact.where(F.col("weather_id").isNotNull())
        .join(dim, "weather_id", "left_anti")
        .count()
    )
    assert dangling == 0
    # and the join is actually effective: most events have an observation
    resolved = fact.where(F.col("weather_id").isNotNull()).count()
    assert resolved > 0


def test_compact_partitions_merges_small_files(spark, sf_dir, tmp_path):
    """Fragmented months (one file per weekly append) compact to one
    file per month with byte-identical content and untouched layout."""
    import glob

    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.tables import load_table
    from tfl_bikes_data_pipeline_spark.warehouse import (
        compact_partitions,
        month_partition,
        write_partitioned,
    )

    events = load_table(spark, sf_dir, "events").withColumn(
        "ym", month_partition("ts")
    )
    out = str(tmp_path / "wh")
    # simulate 4 weekly appends → ≥4 files in every month directory
    for i in range(4):
        write_partitioned(
            events.where(F.pmod(F.col("event_id"), F.lit(4)) == i), out, ["ym"]
        )
    months = glob.glob(f"{out}/ym=*")
    assert months and all(
        len(glob.glob(f"{m}/*.parquet")) >= 4 for m in months
    ), "fixture didn't fragment"
    before = spark.read.parquet(out).groupBy("event_type").count().collect()
    n_before = spark.read.parquet(out).count()

    compact_partitions(spark, out, ["ym"], files_per_partition=1)

    for m in glob.glob(f"{out}/ym=*"):
        assert len(glob.glob(f"{m}/*.parquet")) == 1, f"{m} not compacted"
    assert spark.read.parquet(out).count() == n_before
    assert sorted(map(tuple, spark.read.parquet(out).groupBy("event_type").count().collect())) == sorted(map(tuple, before))


def test_results_partition_independent(spark, sf_dir):
    """The repo's central determinism claim: results are identical
    under ANY partitioning. Flip shuffle partitions between extremes
    and compare canonical row dumps for a cross-section of queries
    (aggregates, window, dedup, fold-based, sketch-free stats)."""
    from tfl_bikes_data_pipeline_spark import registry

    SAMPLE = [
        "q_topk_count",
        "q_moving_avg",
        "q_dedup_exact",
        "q_ewma",
        "q_stats_moments",
        "q_text_unigram_logprob",
    ]

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in SAMPLE:
                results.setdefault(name, []).append(
                    canon(registry.QUERIES[name](spark, sf_dir))
                )
        for name, (a, b) in results.items():
            assert a == b, f"{name}: results differ across partitionings"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_run_stage_rejects_malformed_month(spark, tmp_path):
    """'2021-01' (ISO spelling) previously matched no rows and reported
    success — it must raise instead (review r5)."""
    import pytest

    from tfl_bikes_data_pipeline_spark.engine import run_stage

    with pytest.raises(ValueError, match="YYYYMM"):
        run_stage(spark, str(tmp_path / "wh"), "journeys", month="2021-01")
    with pytest.raises(ValueError, match="YYYYMM"):
        run_stage(spark, str(tmp_path / "wh"), "weather", month="202113")


def test_journeys_degrades_to_null_enrichment_on_empty_weather_dir(spark, sf_dir, tmp_path):
    """A dim_weather dir holding only _SUCCESS (a zero-row weather
    month) must take the NULL-enrichment branch, not crash parquet
    schema inference (review r5)."""
    import os

    from tfl_bikes_data_pipeline_spark.engine import run_stage

    wh = str(tmp_path / "wh")
    os.makedirs(os.path.join(wh, "dim_weather"))
    open(os.path.join(wh, "dim_weather", "_SUCCESS"), "w").close()
    out = run_stage(spark, wh, "journeys", month="202401", sf_dir=sf_dir)
    back = spark.read.parquet(out["fact_events"])
    assert back.count() > 0
    assert back.where(back.weather_id.isNotNull()).count() == 0


def test_journeys_stage_leaves_no_cached_rdds(spark, sf_dir, tmp_path):
    """The journeys stage persists the parsed fact for its three
    consumers; the finally-block must unpersist the SAME handle that
    was cached. Rebinding `fact` to a derived plan made the unpersist a
    silent no-op, leaking one full cached fact per monthly invocation
    (advice r5). A monthly backfill loop must end with zero cached RDDs."""
    from tfl_bikes_data_pipeline_spark.engine import run_stage

    wh = str(tmp_path / "wh")
    # delta-based: the shared session may hold caches from other tests
    before = {
        r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    for m in ("202401", "202402"):
        run_stage(spark, wh, "journeys", month=m, sf_dir=sf_dir)
    leaked = [
        r
        for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if r.id() not in before
    ]
    assert leaked == [], f"cached RDDs leaked by journeys stage: {leaked}"
