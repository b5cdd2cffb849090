"""Time-series / dataset-utility operators: deterministic sampling,
gap-filling resample, and fixed-width histograms.

These extend the reference's surface with the utilities a large-scale
pipeline needs around its fact tables (the reference resamples weather
observations to journey grain implicitly via its alignment joins,
``spark/transform_load.py`` weather stage; here the resample/fill is a
first-class operator).

Scale notes:
- Sampling is a pure narrow filter on a hash of the key — pushes into
  the scan stage, no shuffle, and the sampled subset is reproducible
  across runs/engines (unlike ``df.sample`` whose RNG is
  partition-layout dependent).
- The gap-fill grid derives from a 1-row min/max aggregate and a
  ``sequence``/``explode`` — the grid is O(time-span), independent of
  fact cardinality, and the per-type window's own Exchange spreads it
  across executors. At warehouse scale the bounds would come from
  partition metadata instead of a data pass.
- Histogram bucketing is arithmetic (floor-divide) — fully codegen'd,
  one partial+final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact_avg
from ..tables import load_table

#: The FULL event-type domain, imported from its single definition —
#: a stale local copy previously pinned only 3 of the fixture's 5
#: types, so gap-fill silently produced no series for 'error'/'signup'
#: events (review r5). Pinned (vs discovered) to avoid a discovery
#: pass over the fact table.
from ..plans.queries import EVENT_TYPES  # noqa: E402

#: Keep rows whose md5(key) hex digest starts with this prefix — a
#: deterministic 1/16 sample per prefix character.
SAMPLE_PREFIX = "0"

HIST_BIN_WIDTH = 50.0
HIST_N_BINS = 10  # values clamp into [0, HIST_BIN_WIDTH * HIST_N_BINS)

#: resample bucket width (seconds) — interpolated into the oracle so a
#: width change cannot desynchronize the twin.
RESAMPLE_BUCKET_S = 3600


def hash_sample(df: DataFrame, key: str, prefix: str = SAMPLE_PREFIX) -> DataFrame:
    """Deterministic content-hash sample: identical subset on any engine,
    any partitioning, any run — the property that matters for
    train/eval splits and for debugging at 100 TB (re-running the
    pipeline must reproduce the same sample). One hex character of
    prefix = a 1/16 rate; two = 1/256, etc."""
    digest = F.md5(F.col(key).cast("string"))
    return df.where(digest.startswith(prefix))


def resample_fill(
    events: DataFrame,
    bucket_seconds: int = RESAMPLE_BUCKET_S,
    types: tuple[str, ...] = EVENT_TYPES,
) -> DataFrame:
    """(event_type, bucket, cnt, filled_val) — dense per-type time grid.

    Buckets are ``floor(epoch / bucket_seconds)``; the dense grid spans
    the observed min..max bucket for every pinned type; empty buckets
    get cnt=0 and carry the last observed average value forward
    (leading buckets before the first observation stay NULL).
    """
    hb = F.floor(F.unix_timestamp("ts") / bucket_seconds).cast("long")
    hourly = events.groupBy(
        "event_type", hb.alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_avg("value", "avg_val"),
    )
    bounds = events.agg(
        F.min(hb).alias("lo"), F.max(hb).alias("hi")
    )
    # all-JVM grid: explode(sequence) × explode(array-of-literals) —
    # no Python-RDD scan, no nested-loop join; the per-type window's
    # own Exchange redistributes the grid, so no pre-repartition.
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("bucket")
    ).select(
        "bucket",
        F.explode(F.array(*[F.lit(t) for t in types])).alias("event_type"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "bucket"], "left")
        .na.fill(0, ["cnt"])
        .withColumn("filled_val", F.last("avg_val", ignorenulls=True).over(w))
        .select("event_type", "bucket", "cnt", "filled_val")
    )


def histogram(
    df: DataFrame,
    col: str,
    width: float = HIST_BIN_WIDTH,
    n_bins: int = HIST_N_BINS,
) -> DataFrame:
    """(bin, lo, cnt) — fixed-width histogram with clamped edge bins.
    floor-divide bucketing evaluates identically in IEEE double on any
    engine, so the bin assignment is reproducible bit-for-bit."""
    b = F.least(
        F.greatest(F.floor(F.col(col) / width), F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    # NULL values must not land in a bin: floor(NULL/w) is NULL and both
    # engines' greatest() SKIPS null args, silently mapping NULL to bin
    # 0 (review r5) — exclude them before bucketing on both sides.
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("bin", (F.col("bin") * width).alias("lo"), "cnt")
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Declared queries + oracles
# ---------------------------------------------------------------------------

def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        hash_sample(events, "event_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            exact_avg("value", "avg_val"),
        )
        .orderBy("event_type")
    )


STRATA_K = 50


def stratified_sample(df, group: str, key: str, k: int = STRATA_K):
    """Deterministic per-stratum quota sample: the k smallest content
    hashes in each group. Fixes ``hash_sample``'s weakness for skewed
    strata — every group yields EXACTLY k rows (or all it has), so rare
    classes are never starved, and the subset is engine- and
    partitioning-independent (same property as [[hash_sample]], plus
    the per-group guarantee). One shuffle on the group key; the sort is
    per-stratum top-k (window rank + filter), not a global sort."""
    w = Window.partitionBy(group).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return df.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return stratified_sample(events, "event_type", "event_id").select(
        "event_type", "rk", "event_id"
    ).orderBy("event_type", "rk")


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return resample_fill(events).orderBy("event_type", "bucket")


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return histogram(events, "value")


ORACLES: dict[str, str] = {
    # same md5-of-decimal-string ranking; identical hex digests on
    # both engines make the quota sample engine-portable.
    "q_sample_stratified": f"""
        SELECT event_type, rk, event_id
        FROM (
            SELECT event_type, event_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(event_id::VARCHAR), event_id
                   )::INT AS rk
            FROM events
        ) WHERE rk <= {STRATA_K} ORDER BY event_type, rk
    """,
    "q_sample_hash": f"""
        SELECT event_type, count(1)::BIGINT AS n_sample,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(value)
                   AS avg_val
        FROM events
        WHERE md5(event_id::VARCHAR) LIKE '{SAMPLE_PREFIX}%'
        GROUP BY event_type ORDER BY event_type
    """,
    "q_gap_fill": f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(floor(floor(epoch(ts)) / {RESAMPLE_BUCKET_S}) AS BIGINT) AS bucket,
                   count(1) AS cnt,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                       / count(value) AS avg_val
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT min(bucket) AS lo, max(bucket) AS hi FROM hourly
        ),
        grid AS (
            SELECT t.event_type, unnest(generate_series(lo, hi)) AS bucket
            FROM bounds
            CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in EVENT_TYPES)}) t(event_type)
        )
        SELECT grid.event_type, grid.bucket,
               coalesce(cnt, 0)::BIGINT AS cnt,
               last_value(avg_val IGNORE NULLS) OVER (
                   PARTITION BY grid.event_type ORDER BY grid.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_val
        FROM grid LEFT JOIN hourly USING (event_type, bucket)
        ORDER BY event_type, bucket
    """,
    "q_histogram": f"""
        SELECT bin, bin * {HIST_BIN_WIDTH} AS lo, count(1)::BIGINT AS cnt
        FROM (
            SELECT least(greatest(floor(value / {HIST_BIN_WIDTH}), 0),
                         {HIST_N_BINS - 1})::INT AS bin
            FROM events WHERE value IS NOT NULL
        ) GROUP BY bin ORDER BY bin
    """,
}

QUERIES = {
    "q_sample_hash": q_sample_hash,
    "q_sample_stratified": q_sample_stratified,
    "q_gap_fill": q_gap_fill,
    "q_histogram": q_histogram,
}

BENCH = ["q_sample_hash", "q_sample_stratified", "q_gap_fill"]


def hourly_profile(events: DataFrame) -> DataFrame:
    """(user_id, hour, avg_val) — each user's hour-of-day activity
    profile, a 24-dim PAA-style series summary (piecewise aggregate
    over the daily cycle). Exact DECIMAL sums → one double division,
    the engine-portable aggregate discipline."""
    return (
        events.groupBy("user_id", F.hour("ts").alias("hour"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "user_id",
            "hour",
            (F.col("s").cast("string").cast("double") / F.col("n").cast("double")).alias("avg_val"),
        )
    )


#: profile dimensionality (hour-of-day cycle) — interpolated into
#: the oracle so a dims change cannot desynchronize the twin.
PROFILE_DIMS = 24

def profile_distances(profiles: DataFrame, dims: int = PROFILE_DIMS) -> DataFrame:
    """All-pairs squared-euclidean distance between per-user profiles,
    computed in LONG form: self-join on the dimension key, one exact
    aggregate of squared diffs per pair. Order-independent (DECIMAL
    sum), so identical under any shuffle — unlike folding a per-user
    array. Pairs are kept only at full dimensional overlap (``dims``
    shared hours), making the metric well-defined without imputation.
    The dimension-key join fans out |users|·dims rows per side — at
    corpus scale you'd block first (e.g. LSH over the profiles, the
    ``dedup.py`` machinery) and use this as the verify step."""
    a = profiles.select(
        F.col("user_id").alias("user_a"), "hour", F.col("avg_val").alias("va")
    )
    b = profiles.select(
        F.col("user_id").alias("user_b"), "hour", F.col("avg_val").alias("vb")
    )
    d = F.col("va") - F.col("vb")
    return (
        a.join(b, "hour")
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum((d * d).cast("decimal(38,6)")).cast("string").cast("double").alias("dist_sq"),
        )
        .where(F.col("n_shared") == dims)
    )


#: candidate-set bound for the all-pairs verify (all-pairs is
#: O(candidates² · dims) — 100 candidates ≈ 5k pairs at any SF; the
#: blocking stage, not this constant, is what changes at 100 TB)
TS_SIM_CANDIDATES = 100


def q_ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most similar user pairs by hour-of-day profile distance —
    time-series similarity search over entity behavior series. The
    all-pairs distance runs over a bounded candidate set (the top
    ``TS_SIM_CANDIDATES`` most-active users, deterministic tie-break):
    unblocked all-pairs is quadratic in users and already took 35 s at
    sf0.1 (1 500 users); candidate selection IS the scale knob — swap
    in an LSH/IVF block (``dedup.py`` / ``similarity.py`` machinery)
    for content-based candidates at corpus scale."""
    events = load_table(spark, sf_dir, "events")
    top_users = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(TS_SIM_CANDIDATES)
        .select("user_id")
    )
    # filter the FACT rows to candidates BEFORE the profile aggregate —
    # aggregating all users' profiles and then discarding all but the
    # candidates wasted |users|x24 groups (the oracle always joined
    # events to top_users first; review r5).
    prof = hourly_profile(events.join(F.broadcast(top_users), "user_id"))
    return (
        profile_distances(prof)
        .orderBy("dist_sq", "user_a", "user_b")
        .limit(10)
    )


ORACLES["q_ts_similarity"] = f"""
    WITH top_users AS (
        SELECT user_id FROM events
        GROUP BY user_id ORDER BY count(1) DESC, user_id LIMIT {TS_SIM_CANDIDATES}
    ),
    prof AS (
        SELECT user_id, extract(hour FROM ts)::INT AS hour,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(1) AS DOUBLE) AS avg_val
        FROM events JOIN top_users USING (user_id)
        GROUP BY user_id, hour
    ),
    pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               count(1)::BIGINT AS n_shared,
               CAST(CAST(sum(CAST((a.avg_val - b.avg_val) * (a.avg_val - b.avg_val)
                             AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS dist_sq
        FROM prof a JOIN prof b
          ON a.hour = b.hour AND a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
    )
    SELECT user_a, user_b, n_shared, dist_sq
    FROM pairs WHERE n_shared = {PROFILE_DIMS}
    ORDER BY dist_sq, user_a, user_b LIMIT 10
"""

QUERIES["q_ts_similarity"] = q_ts_similarity
BENCH.append("q_ts_similarity")


# ---------------------------------------------------------------------------
# batch sessionization
# ---------------------------------------------------------------------------

#: gap (seconds) that closes a session — the batch twin of the
#: streaming session window's 30-minute gap (streaming/stateful.py).
SESSION_GAP_S = 1800


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """(user_id, session_id, n_events, duration_s, total_value) — batch
    sessionization: per user, events ordered by (ts, event_id) start a
    new session whenever the gap from the previous event exceeds
    ``gap_s``; ``session_id`` is the 1-based session index within the
    user. The classic lag → flag → running-sum assignment, then one
    per-session aggregate.

    Scale shape: ONE shuffle on ``user_id`` serves both the window pass
    and the (user_id, session_id) aggregate — Catalyst reuses the
    partitioning because the groupBy keys are a superset of the window
    partition key, so no second Exchange. Per-user state is the window
    frame only (no corpus-wide sort). This is the batch twin of the
    streaming session window ([[q_session_window]]); at 100 TB the fact
    table's user-bucketed layout makes the one shuffle a no-op too.
    Sums are exact DECIMAL then one double cast — engine-portable.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sessed = events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sessed.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(epoch) - F.min(epoch)).alias("duration_s"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(events).orderBy("user_id", "session_id")


ORACLES["q_sessionize"] = f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value, floor(epoch(ts))::BIGINT AS es,
               CASE WHEN floor(epoch(ts))::BIGINT
                         - lag(floor(epoch(ts))::BIGINT) OVER w > {SESSION_GAP_S}
                    OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessed AS (
        SELECT user_id, es, value,
               -- CAST: DuckDB types a window sum of integers HUGEINT,
               -- which pandas renders float64 while Spark's running sum
               -- is long — value-equal but hash-unstable (r10 red row).
               CAST(sum(is_new) OVER (
                   -- order by RAW ts (not the truncated es): sub-second
                   -- ordering must match the Spark window exactly
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(1)::BIGINT AS n_events,
           (max(es) - min(es))::BIGINT AS duration_s,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               AS total_value
    FROM sessed GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""

QUERIES["q_sessionize"] = q_sessionize
BENCH.append("q_sessionize")


# ---------------------------------------------------------------------------
# EWMA smoothing
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3


def ewma_last(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """(user_id, event_type, n, ewma) — final exponentially-weighted
    moving average of ``value`` per (user, type) series, ordered by
    (ts, event_id).

    EWMA is a sequential recurrence (acc ← α·x + (1−α)·acc), which no
    commutative SQL aggregate expresses — the engine-portable trick is
    an ORDERED per-series array + a LEFT FOLD: Spark's ``aggregate``
    and DuckDB's ``list_reduce`` both fold left, so the IEEE operation
    sequence is identical bit-for-bit on both engines (same discipline
    as the dot-product folds in functions/vectors.py).

    Scale shape: one shuffle on the series key; per-series state is the
    collected value array — series here are (user, type) event streams
    (thousands of points at most), the same per-key boundedness the
    streaming stateful path assumes. For unbounded series you'd chunk
    by time and carry the accumulator across chunks (the streaming
    variant's state exactly)."""
    seq = events.groupBy("user_id", "event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    fold = (
        f"aggregate(slice(vals, 2, size(vals) - 1), vals[0], "
        f"(acc, x) -> CAST({alpha} AS DOUBLE) * x "
        f"+ CAST({1 - alpha} AS DOUBLE) * acc)"
    )
    return (
        seq.select(
            "user_id",
            "event_type",
            F.expr("transform(s, e -> e.value)").alias("vals"),
        )
        .select(
            "user_id",
            "event_type",
            F.size("vals").alias("n"),
            F.round(F.expr(fold), 6).alias("ewma"),
        )
    )


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return ewma_last(events).orderBy("user_id", "event_type")


ORACLES["q_ewma"] = f"""
    WITH seq AS (
        SELECT user_id, event_type,
               list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, len(vals)::INT AS n,
           round(list_reduce(vals,
               (acc, x) -> {EWMA_ALPHA}::DOUBLE * x
                           + {1 - EWMA_ALPHA}::DOUBLE * acc), 6) AS ewma
    FROM seq ORDER BY user_id, event_type
"""

QUERIES["q_ewma"] = q_ewma
BENCH.append("q_ewma")


# ---------------------------------------------------------------------------
# z-score anomaly detection
# ---------------------------------------------------------------------------

ZSCORE_THRESHOLD = 3.0


def zscore_outliers(
    events: DataFrame, threshold: float = ZSCORE_THRESHOLD
) -> DataFrame:
    """(event_id, event_type, value, z) — events whose value deviates
    from its type's mean by more than ``threshold`` standard deviations
    (population σ).

    Determinism discipline: Σx and Σx² are EXACT DECIMAL aggregates
    (order-independent), cast to double once; mean/σ/z are then a fixed
    double expression over those two exact scalars, so every engine
    computes the identical z bit-for-bit. The per-type stats relation is
    tiny and broadcast back onto the fact scan — two passes over the
    fact, no wide shuffle of fact rows at all."""
    from ..functions import exact_sum

    stats = events.groupBy("event_type").agg(
        exact_sum("value", "sx"),
        F.sum(
            (F.col("value").cast("decimal(18,6)") * F.col("value").cast("decimal(18,6)")).cast("decimal(38,12)")
        ).cast("string").cast("double").alias("sxx"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("sx") / F.col("n")
    # clamp at 0: a constant-valued group's variance can land a few
    # ulps below zero in doubles; DuckDB's sqrt ERRORS on negatives
    # (Spark returns NaN), so both sides clamp identically.
    var = F.greatest(
        F.col("sxx") / F.col("n") - mean * mean, F.lit(0.0)
    )
    stats = stats.select(
        "event_type", mean.alias("mu"), F.sqrt(var).alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        # per-type stats are keyed on a data column — unhinted per the
        # broadcast policy; AQE BHJs the tiny relation on its own
        events.join(stats, "event_type")
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
        .where(F.abs(F.col("z")) > threshold)
    )


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return zscore_outliers(events).orderBy("event_id")


ORACLES["q_anomaly_zscore"] = f"""
    WITH stats AS (
        SELECT event_type,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(sum(CAST(CAST(value AS DECIMAL(18,6))
                    * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxx,
               count(1) AS n
        FROM events GROUP BY event_type
    ),
    sded AS (
        SELECT event_type, sx / n AS mu,
               sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)) AS sigma
        FROM stats
    )
    SELECT event_id, e.event_type, value,
           round((value - mu) / sigma, 6) AS z
    FROM events e JOIN sded s ON e.event_type = s.event_type
    WHERE abs(round((value - mu) / sigma, 6)) > {ZSCORE_THRESHOLD}
    ORDER BY event_id
"""

QUERIES["q_anomaly_zscore"] = q_anomaly_zscore
BENCH.append("q_anomaly_zscore")


# ---------------------------------------------------------------------------
# rolling distinct actives (DAU / trailing-window WAU)
# ---------------------------------------------------------------------------

ROLLING_ACTIVE_DAYS = 7


def rolling_active_users(
    events: DataFrame, window_days: int = ROLLING_ACTIVE_DAYS
) -> DataFrame:
    """(day, dau, wau) — daily active users and trailing-``window_days``
    distinct actives per day: the engagement metric pair every product
    warehouse reports. DISTINCT-over-a-sliding-range has no window-
    function form (COUNT(DISTINCT) OVER RANGE is unsupported
    everywhere), so the scalable shape is: collapse to distinct
    (user, day) pairs first — the only pass over the fact table — then
    a bounded RANGE JOIN of that small relation onto the day grid
    (each user-day lands in ≤ ``window_days`` windows) and one exact
    distinct aggregate per day. At 100 TB the user-day relation is
    ~|users|·|days| — warehouse-small — and the fact table is touched
    exactly once."""
    user_days = events.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = user_days.select("d").distinct()
    # equality-keyed, never a nested-loop range join: each user-day
    # EXPLODES into the ≤ window_days grid days it covers (a narrow
    # ≤7× fan-out), then a plain hash aggregate per covered day and a
    # semi filter onto observed days. Work is O(|user_days|·window),
    # through one ordinary shuffle — the bounded shape a theta-join
    # would destroy (Spark plans the d BETWEEN form as a
    # BroadcastNestedLoopJoin over every (grid-day, user-day) pair).
    covered = user_days.select(
        F.explode(
            F.expr(f"sequence(d, date_add(d, {window_days - 1}))")
        ).alias("day"),
        "user_id",
    )
    w = (
        covered.join(days.select(F.col("d").alias("day")), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = user_days.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return dau.join(w, "day").select("day", "dau", "wau")


def q_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return rolling_active_users(events).orderBy("day")


ORACLES["q_rolling_actives"] = f"""
    WITH user_days AS (
        SELECT DISTINCT ts::DATE AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM user_days),
    wau AS (
        SELECT g.d AS day, count(DISTINCT u.user_id) AS wau
        FROM days g JOIN user_days u
          ON u.d <= g.d AND u.d > g.d - INTERVAL {ROLLING_ACTIVE_DAYS} DAY
        GROUP BY g.d
    ),
    dau AS (
        SELECT d AS day, count(DISTINCT user_id) AS dau
        FROM user_days GROUP BY d
    )
    SELECT day, dau::BIGINT AS dau, wau::BIGINT AS wau
    FROM dau JOIN wau USING (day)
    ORDER BY day
"""

QUERIES["q_rolling_actives"] = q_rolling_actives
BENCH.append("q_rolling_actives")
