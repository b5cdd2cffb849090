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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact_row_avg
from ..plans.pipelines import ORACLES as PIPELINE_ORACLES
from ..plans.pipelines import build_aligned_weather
from ..tables import load_table


def null_count(col: str) -> Column:
    """NULL tally for one column, aggregation-ready. count(1)-count(col)
    rather than sum(isNull::int): the sum form returns NULL on an empty
    relation where the oracle's count-minus-count form returns 0."""
    return (F.count(F.lit(1)) - F.count(F.col(col))).cast("long").alias(f"{col}_nulls")


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


def moments(df: DataFrame, group: str, x: Column, y: Column) -> DataFrame:
    """Grouped second-moment statistics (mean/variance/stddev of ``x``,
    Pearson correlation of ``x`` vs ``y``) computed the
    order-independent way: one hash aggregate of exact DECIMAL power
    sums (n, Σx, Σx², Σy, Σy², Σxy — associative, so identical under
    any partitioning), then the closed-form double formulas. Spark's
    built-in ``stddev``/``corr`` stream doubles in partition order and
    are not bit-reproducible across engines or shuffles; this is, and
    it costs the same single partial+final aggregate."""
    # decimal totals go to double VIA STRING: both engines' string→double
    # parsers are correctly rounded (strtod semantics), while their
    # direct decimal→double casts round differently once the scaled
    # integer exceeds ~2^53 (bit observed at sf0.1 on Σx·y). The string
    # hop makes the one lossy step engine-independent at ANY magnitude.
    def to_dbl(c):
        return c.cast("string").cast("double")

    # row-set coherence: n counts non-null x, so the y/xy sums must run
    # over the SAME rows — without the filter, x-NULL rows inflate sy
    # and the Pearson formula drifts off the (x, y) pairs (both engines
    # equally, so the oracle could not catch it; review r5).
    df = df.where(x.isNotNull())
    sums = df.groupBy(group).agg(
        F.count(x).alias("n"),
        to_dbl(F.sum(x.cast("decimal(27,6)"))).alias("sx"),
        to_dbl(F.sum((x * x).cast("decimal(27,6)"))).alias("sxx"),
        to_dbl(F.sum(y.cast("decimal(27,6)"))).alias("sy"),
        to_dbl(F.sum((y * y).cast("decimal(38,6)"))).alias("syy"),
        to_dbl(F.sum((x * y).cast("decimal(38,6)"))).alias("sxy"),
    )
    # textual twins of the oracle SQL — same IEEE op sequence. sqrt
    # args are clamped with greatest(x, 0): a constant-valued group's
    # closed-form variance is ulp-NEGATIVE (~-2e-12 measured), which
    # DuckDB hard-errors on while Spark returns NaN — the lockstep rule.
    return sums.selectExpr(
        group,
        "n",
        "sx / n AS mean_x",
        "sxx / n - (sx / n) * (sx / n) AS var_x",
        "sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)) AS std_x",
        "(sxy / n - (sx / n) * (sy / n)) / "
        "(sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)) * "
        "sqrt(greatest(syy / n - (sy / n) * (sy / n), 0.0))) AS corr_xy",
    )


#: Epoch baseline (2023-11-14) + hour scaling for the time axis of the
#: drift correlation. Pearson corr is invariant under affine transforms
#: of either variable, so this changes nothing semantically — but it
#: keeps y ≲ 3e4 and every power-sum product ≲ 1e15, inside the range
#: where double→DECIMAL conversion is exact. Raw epoch seconds put
#: Σy²·1e6 near 1e27, where DuckDB's and the JVM's double→decimal
#: rounding algorithms disagree in the last bits (observed at sf0.01).
_EPOCH_BASE = 1_700_000_000
_SECS_PER_HOUR = 3600.0


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distribution profile of event values, with value-vs-time
    correlation (drift detector: a nonzero corr means the value scale
    moves over the capture window). Time axis: hours since _EPOCH_BASE."""
    events = load_table(spark, sf_dir, "events")
    hours = (
        (F.unix_timestamp("ts") - F.lit(_EPOCH_BASE)).cast("double")
        / F.lit(_SECS_PER_HOUR)
    )
    return moments(events, "event_type", F.col("value"), hours).orderBy("event_type")


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type — the
    sketch path for cardinalities where exact ``q_count_distinct``'s
    two-phase shuffle is not worth it at 100 TB. No DuckDB oracle (the
    two engines' HLL implementations differ by design); the driver
    records a rows-only check and ``tests/test_profile_stats.py``
    bounds the relative error against the exact count."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .orderBy("event_type")
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantile sketch (Greenwald-Khanna via
    ``percentile_approx``): the mergeable, single-pass path for
    percentile dashboards at 100 TB, where exact ``q_quantiles``'s
    per-group sort is the bottleneck. Rank error is bounded by
    1/accuracy; no DuckDB oracle (sketch-valued by design) — the
    driver records rows-only and ``tests/test_profile_stats.py``
    bounds each estimate between neighboring exact quantiles."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.25, 0.5, 0.75, 0.95], 10000
            ).alias("q")
        )
        .select(
            "event_type",
            F.col("q").getItem(0).alias("p25"),
            F.col("q").getItem(1).alias("p50"),
            F.col("q").getItem(2).alias("p75"),
            F.col("q").getItem(3).alias("p95"),
        )
        .orderBy("event_type")
    )


def q_approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-HASH-verifiable gate over the SAME HLL++ code path as
    [[q_approx_distinct]] (verdict r11 task 1: the sketch value itself
    can never hash-match an exact engine, so the two ``q_approx_*``
    queries were the only registry entries without a possible driver
    hash row). The bound check moves INSIDE the plan: per event type,
    emit the exact distinct count plus ``within_bound`` = (HLL++
    rsd=0.02 estimate inside the documented ±max(10%·n, 5) interval —
    the identical interval ``BOUND_ORACLES['q_approx_distinct']``
    asserts). The DuckDB oracle recomputes the exact count and asserts
    the literal TRUE, so a sketch estimate outside its error bound
    flips a boolean and fails the driver hash compare.

    Shape note (review r12, MEASURED): the tempting one-groupBy form
    (count_distinct + approx_count_distinct in a single agg) is
    1.7-2× SLOWER than this two-aggregate join at both 3M and 100k
    rows in a matched-session A/B — Spark's single-distinct rewrite
    keys the first aggregate phase on (event_type, user_id), dragging
    the HLL buffer through a per-PAIR aggregate with far more sketch
    merges, and the merge HashAggregate is interpreted
    (TypedImperativeAggregate fallback). Two lean codegen'd scans
    joining two ≤#event_type-row results win; AQE broadcasts the
    join."""
    events = load_table(spark, sf_dir, "events")
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    est = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )
    n = F.col("exact_users").cast("double")
    tol = F.greatest(F.lit(0.10) * n, F.lit(5.0))
    a = F.col("approx_users").cast("double")
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "exact_users",
            ((a >= F.floor(n - tol)) & (a <= F.ceil(n + tol))).alias(
                "within_bound"
            ),
        )
        .orderBy("event_type")
    )


def q_approx_quantiles_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-HASH-verifiable gate over the SAME Greenwald-Khanna code
    path as [[q_approx_quantiles]] (verdict r11 task 1, twin of
    [[q_approx_distinct_gate]]): per event type, each
    ``percentile_approx(value, p, 10000)`` estimate is checked against
    the DISCRETE order-statistic window at ranks ⌊(p−0.011)·n⌋ and
    ⌈(p+0.011)·n⌉+1 — the identical clamped rank bounds
    ``BOUND_ORACLES['q_approx_quantiles']`` uses (order statistics,
    never interpolated quantiles: interpolation can land strictly
    between data values and reject a rank-correct sketch). The bound
    fractions are pre-resolved via ``round(p±0.011, 3)`` — for these
    four p values that is BIT-IDENTICAL to ``p - 0.011`` (verified:
    0.25−0.011 == 0.239 exactly in IEEE double), so this is clarity/
    future-proofing against p values whose offset ISN'T the correctly
    rounded 3-decimal double, not a behavior change (review r13,
    correcting ADVICE r12's hypothesized-but-unreproducible 1-ulp
    floor case). The real cross-engine caveat is arithmetic MODE, not
    literal parsing: Spark computes ``floor(frac·n)`` in binary
    double while DuckDB's ``0.239`` is DECIMAL(4,3) and its floor is
    exact — at integer boundaries of frac·n these can differ by one
    rank (measured: 0.939·17000k gives double-floor 15962 vs exact
    15963 — 9 n values in the first 200k; the double side is one rank
    WIDER). That can never flip the driver hash: the ``*_ok`` columns
    are computed entirely Spark-side against Spark's own window and
    the oracle emits literal TRUEs, while the sketch VALUES are
    independently bound-checked with DuckDB's exact arithmetic in
    ``BOUND_ORACLES['q_approx_quantiles']``; the ±0.001 slack beyond
    the sketch's ±0.01 rank guarantee absorbs the boundary rank on
    both sides. The oracle emits the exact non-null count plus
    literal TRUEs, so a rank-bound violation fails the driver hash.

    Scale posture: the bounds side sorts each group's values via
    ``collect_list`` — the exact-quantile single-task memory shape.
    That is deliberate and GATE-ONLY: the production paths stay
    [[q_approx_quantiles]] (mergeable sketch) and
    [[q_quantiles_scaleout]] (distributed ranks); this query exists
    to pin the sketch path's error contract in driver artifacts.
    Registration does put it in the bench sweep (the no-silent-caps
    rule tops BENCH_QUERIES up to the full registry), so the
    per-group ceiling is MEASURED, not assumed (ADVICE r12): events
    has 5 event types; the largest group holds 20,302 non-null
    doubles at sf0.1 (~160 KB of array per aggregation buffer) and
    ~2.0M at the 100× databound sweep (~16 MB) — both orders of
    magnitude under task memory on every swept scale. The shape stays
    out of any corpus-cardinality path. All three aggregates ride ONE
    groupBy — one scan, one exchange, no re-join (review r12, same
    shape as [[q_approx_distinct_gate]])."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    agg = events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.25, 0.5, 0.75, 0.95], 10000).alias("q"),
        F.array_sort(F.collect_list("value")).alias("vs"),
        F.count("value").alias("n_values"),
    )
    n = F.col("n_values")

    def ok(i: int, p: float) -> Column:
        # round(p±0.011, 3): the correctly-rounded IEEE double of the
        # 3-decimal literal (bit-identical to p±0.011 for these four
        # p — defensive only; see docstring for the real cross-engine
        # arithmetic-mode caveat)
        lo_frac, hi_frac = round(p - 0.011, 3), round(p + 0.011, 3)
        lo_rank = F.greatest(F.lit(1), F.floor(F.lit(lo_frac) * n)).cast("int")
        hi_rank = F.least(n.cast("int"), (F.ceil(F.lit(hi_frac) * n) + 1).cast("int"))
        e = F.col("q").getItem(i)
        return (e >= F.element_at("vs", lo_rank)) & (
            e <= F.element_at("vs", hi_rank)
        )

    return agg.select(
        "event_type",
        "n_values",
        ok(0, 0.25).alias("p25_ok"),
        ok(1, 0.50).alias("p50_ok"),
        ok(2, 0.75).alias("p75_ok"),
        ok(3, 0.95).alias("p95_ok"),
    ).orderBy("event_type")


#: winsorization clip fraction as an integer divisor: k = n div 20 = 5%
#: per tail. Integer division — no float×count boundary arithmetic to
#: diverge between engines.
WINSOR_DIV = 20


def winsorize_profile(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """Per-key winsorized-mean profile: clip ``value_col`` to the
    [k+1 .. n-k]-th order statistics (k = n div 20, i.e. 5% per tail)
    and report n, the clip bounds, and exact raw vs winsorized means —
    the outlier-robust location estimate a curation pipeline uses to
    gate numeric feature columns.

    Bounds are RANK-BASED (exact data values via
    ``element_at(array_sort(collect_list(...)))``, 1-based in both
    engines), never interpolated percentiles: interpolation arithmetic
    differs between engines at ~1 ulp, and a clip COMPARISON against a
    1-ulp-diverged boundary can flip rows (the [[decimal-cast-tie-traps]]
    failure mode); an order statistic is the same stored double
    everywhere. Two passes over the input: a per-key collect for the
    bounds (grouped-sort memory profile, same scale posture as exact
    ``q_quantiles`` — for unbounded key cardinality use the
    approx-sketch path [[q_approx_quantiles]] instead) and one
    partial-aggregated clamp pass with the key-cardinality bounds
    relation broadcast."""
    vals = df.where(F.col(value_col).isNotNull())
    bounds = (
        vals.groupBy(key)
        .agg(
            F.array_sort(F.collect_list(value_col)).alias("vs"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            key,
            "n",
            F.element_at("vs", (F.expr(f"n div {WINSOR_DIV}") + 1).cast("int")).alias(
                "lo_val"
            ),
            F.element_at(
                "vs", (F.col("n") - F.expr(f"n div {WINSOR_DIV}")).cast("int")
            ).alias("hi_val"),
        )
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("lo_val")), F.col("hi_val"))
    return (
        vals.join(bounds, key)
        .groupBy(key, "n", "lo_val", "hi_val")
        .agg(
            exact_row_avg(value_col, "mean_raw"),
            exact_row_avg(clipped, "mean_winsorized"),
        )
        .orderBy(key)
    )


def q_winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return winsorize_profile(events, "event_type", "value")


#: PSI bucketing: n_buckets equal-width cells over the value range,
#: +1 add-one smoothing so empty cells never divide by zero.
PSI_BUCKETS = 8
PSI_BUCKET_WIDTH = 100


def distribution_psi(
    reference: DataFrame,
    candidate: DataFrame,
    value_col: str,
    bucket_width: int = PSI_BUCKET_WIDTH,
    n_buckets: int = PSI_BUCKETS,
) -> DataFrame:
    """(bucket, n_ref, n_cand, p_ref, p_cand, contrib, psi_total) — the
    Population Stability Index between a reference and a candidate
    sample of ``value_col``: Σ (p_ref − p_cand)·ln(p_ref/p_cand) over
    equal-width buckets, the standard drift alarm a curation pipeline
    runs on every incoming batch against the accepted corpus
    (rule-of-thumb: <0.1 stable, >0.25 drifted).

    Scale shape: ONE union + one map-side-combined aggregate with at
    most ``n_buckets`` groups — a 100 TB input reduces to ≤n_buckets
    rows per partition before the shuffle (the CMS communication
    bound); everything after operates on the constant-size bucket
    relation, where a global window is bounded by construction.

    Determinism: counts are integers (add-one smoothed), so the p's
    are identical ratios in both engines; ln contributions are rounded
    to 6 dp before the exact decimal total (the [[q_text_keyness]] ln
    precedent)."""
    from pyspark.sql import Window

    def bucketed(df: DataFrame, tag: str) -> DataFrame:
        # explicit floor: Spark's double→long cast truncates while
        # DuckDB's CAST rounds — floor + the oracle's // are identical
        b = F.least(
            F.floor(F.col(value_col) / bucket_width).cast("long"),
            F.lit(n_buckets - 1),
        )
        return df.select(F.lit(tag).alias("half"), b.alias("bucket"))

    counts = (
        bucketed(reference, "ref")
        .unionByName(bucketed(candidate, "cand"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == "ref", 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("half") == "cand", 1).otherwise(0)).alias("n_cand"),
        )
    )
    spark = reference.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    dense = spine.join(counts, "bucket", "left").select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_cand", F.lit(0)).cast("long").alias("n_cand"),
    )
    w = Window.partitionBy()  # bucket relation: n_buckets rows by construction
    p_ref = (F.col("n_ref") + 1).cast("double") / (
        F.sum("n_ref").over(w) + n_buckets
    ).cast("double")
    p_cand = (F.col("n_cand") + 1).cast("double") / (
        F.sum("n_cand").over(w) + n_buckets
    ).cast("double")
    with_p = dense.select(
        "bucket",
        "n_ref",
        "n_cand",
        p_ref.alias("p_ref"),
        p_cand.alias("p_cand"),
        F.round((p_ref - p_cand) * F.log(p_ref / p_cand), 6).alias("contrib"),
    )
    return with_p.select(
        "*",
        F.sum(F.col("contrib").cast("decimal(18,6)"))
        .over(w)
        .cast("string")
        .cast("double")
        .alias("psi_total"),
    ).orderBy("bucket")


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of document length between the two md5 halves of the corpus
    (the same content-hash split discipline as train/val assignment) —
    a same-distribution pair, so the expected PSI is near zero; the
    operator is what matters, the fixture is its null case."""
    docs = load_table(spark, sf_dir, "documents")
    h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return distribution_psi(
        docs.where(h1 < "8"), docs.where(h1 >= "8"), "n_chars"
    )


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
    "q_stats_moments": q_stats_moments,
    "q_approx_distinct": q_approx_distinct,
    "q_approx_quantiles": q_approx_quantiles,
    "q_approx_distinct_gate": q_approx_distinct_gate,
    "q_approx_quantiles_gate": q_approx_quantiles_gate,
    "q_winsorized_means": q_winsorized_means,
    "q_drift_psi": q_drift_psi,
}
# q_bloom_filter_probe is defined below (with the CMS/sketch section)
# and registered there, CMS-style.

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
    # identical power-sum → closed-form-double pipeline as the Spark
    # side; the DECIMAL sums make the inputs to the double formulas
    # bit-equal, and the formulas are textual twins.
    "q_stats_moments": """
        WITH h AS (
            SELECT event_type, value,
                   CAST(floor(epoch(ts))::BIGINT - 1700000000 AS DOUBLE)
                       / 3600.0 AS y
            FROM events
            WHERE value IS NOT NULL
        ),
        s AS (
            SELECT event_type,
                   count(value)::BIGINT AS n,
                   CAST(CAST(sum(CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(sum(CAST(value * value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(sum(CAST(y AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy,
                   CAST(CAST(sum(CAST(value * y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy
            FROM h GROUP BY event_type
        )
        SELECT event_type, n,
               sx / n AS mean_x,
               sxx / n - (sx / n) * (sx / n) AS var_x,
               sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)) AS std_x,
               (sxy / n - (sx / n) * (sy / n)) /
               (sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)) *
                sqrt(greatest(syy / n - (sy / n) * (sy / n), 0.0))) AS corr_xy
        FROM s ORDER BY event_type
    """,
}

# Gate-twin oracles (verdict r11 task 1): the oracle recomputes the
# EXACT aggregate and asserts literal TRUE for each in-plan bound
# check — the sketch path's error contract becomes a driver hash row.
ORACLES["q_approx_distinct_gate"] = """
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY event_type ORDER BY event_type
"""
ORACLES["q_approx_quantiles_gate"] = """
    SELECT event_type,
           count(value)::BIGINT AS n_values,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p95_ok
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
"""

ORACLES["q_drift_psi"] = f"""
    WITH tagged AS (
        SELECT CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1) < '8'
                    THEN 'ref' ELSE 'cand' END AS half,
               least(n_chars // {PSI_BUCKET_WIDTH}, {PSI_BUCKETS - 1}) AS bucket
        FROM documents
    ),
    counts AS (
        SELECT bucket,
               sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END)::BIGINT AS n_ref,
               sum(CASE WHEN half = 'cand' THEN 1 ELSE 0 END)::BIGINT AS n_cand
        FROM tagged GROUP BY bucket
    ),
    dense AS (
        SELECT s.bucket, coalesce(n_ref, 0)::BIGINT AS n_ref,
               coalesce(n_cand, 0)::BIGINT AS n_cand
        FROM (SELECT unnest(generate_series(0, {PSI_BUCKETS - 1}))::BIGINT AS bucket) s
        LEFT JOIN counts USING (bucket)
    ),
    withp AS (
        SELECT bucket, n_ref, n_cand,
               (n_ref + 1)::DOUBLE / (sum(n_ref) OVER () + {PSI_BUCKETS})::DOUBLE AS p_ref,
               (n_cand + 1)::DOUBLE / (sum(n_cand) OVER () + {PSI_BUCKETS})::DOUBLE AS p_cand
        FROM dense
    ),
    contribs AS (
        SELECT *, round((p_ref - p_cand) * ln(p_ref / p_cand), 6) AS contrib
        FROM withp
    )
    SELECT bucket, n_ref, n_cand, p_ref, p_cand, contrib,
           CAST(CAST(sum(CAST(contrib AS DECIMAL(18,6))) OVER () AS VARCHAR) AS DOUBLE)
               AS psi_total
    FROM contribs ORDER BY bucket
"""

ORACLES["q_winsorized_means"] = f"""
    WITH vals AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
    b AS (
        SELECT event_type,
               list(value ORDER BY value) AS vs,
               count(1)::BIGINT AS n
        FROM vals GROUP BY event_type
    ),
    bounds AS (
        SELECT event_type, n,
               vs[CAST(n // {WINSOR_DIV} AS INT) + 1] AS lo_val,
               vs[CAST(n - n // {WINSOR_DIV} AS INT)] AS hi_val
        FROM b
    )
    SELECT v.event_type, n, lo_val, hi_val,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               / count(1) AS mean_raw,
           CAST(CAST(sum(CAST(least(greatest(value, lo_val), hi_val)
               AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               / count(1) AS mean_winsorized
    FROM vals v JOIN bounds USING (event_type)
    GROUP BY 1, 2, 3, 4 ORDER BY v.event_type
"""


#: Value-level checks for the two sketch queries (which can never
#: hash-match an exact engine): DuckDB computes per-key [lo, hi]
#: intervals from the EXACT aggregates, and the differential gate
#: asserts every Spark estimate lands inside its interval (see
#: registry.BOUND_ORACLES for the column convention).
BOUND_ORACLES: dict[str, str] = {
    # HLL++ with rsd=0.02 → 3σ ≈ 6% relative error; the bound allows
    # 10% (or ±5 absolute for tiny cardinalities, where the integer
    # estimate is lumpy) around the exact COUNT(DISTINCT).
    "q_approx_distinct": """
        WITH exact AS (
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               CAST(floor(n - greatest(0.10 * n, 5)) AS BIGINT) AS approx_users_lo,
               CAST(ceil(n + greatest(0.10 * n, 5)) AS BIGINT) AS approx_users_hi
        FROM exact ORDER BY event_type
    """,
    # Greenwald-Khanna with accuracy=10000 returns an ACTUAL ELEMENT
    # whose rank is within ±(1e-4·n + convention slack) of target, so
    # the bounds must be DISCRETE ORDER STATISTICS, never interpolated
    # quantiles: on a small/sparse group, quantile_cont(p∓0.01) can
    # interpolate to an interval strictly between two data values and
    # reject a correct sketch (e.g. values [1,2,3,4] at p25: the
    # element 1.0 vs an interpolated [1.72, 1.78]). Bound = the
    # elements at ranks ⌊(p−0.011)·n⌋ and ⌈(p+0.011)·n⌉+1 (clamped),
    # covering rank error plus either engine's index convention.
    "q_approx_quantiles": """
        WITH s AS (
            SELECT event_type, list(value ORDER BY value) AS vs,
                   count(value)::BIGINT AS n
            FROM events WHERE value IS NOT NULL GROUP BY event_type
        )
        SELECT event_type,
               vs[greatest(1, CAST(floor(0.239 * n) AS INT))] AS p25_lo,
               vs[least(n::INT, CAST(ceil(0.261 * n) AS INT) + 1)] AS p25_hi,
               vs[greatest(1, CAST(floor(0.489 * n) AS INT))] AS p50_lo,
               vs[least(n::INT, CAST(ceil(0.511 * n) AS INT) + 1)] AS p50_hi,
               vs[greatest(1, CAST(floor(0.739 * n) AS INT))] AS p75_lo,
               vs[least(n::INT, CAST(ceil(0.761 * n) AS INT) + 1)] AS p75_hi,
               vs[greatest(1, CAST(floor(0.939 * n) AS INT))] AS p95_lo,
               vs[least(n::INT, CAST(ceil(0.961 * n) AS INT) + 1)] AS p95_hi
        FROM s ORDER BY event_type
    """,
}


# ---------------------------------------------------------------------------
# count-min sketch, expressed relationally
# ---------------------------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 64   # buckets per row
CMS_TOP_K = 10


def _cms_bucket(j_col, key_col):
    """Bucket of `key` under hash row `j`: 16-bit integer from the md5
    of "j:key", mod CMS_W. Pure md5 + integer math — engine-identical."""
    h = F.md5(F.concat(j_col.cast("string"), F.lit(":"), key_col.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % CMS_W).alias("bucket")


def cms_sketch(df: DataFrame, key: str) -> DataFrame:
    """(j, bucket, cnt) — a count-min sketch built as a RELATION: each
    row votes into CMS_D (row, bucket) cells, and the sketch is the
    grouped count. The scale property is the whole point: the groupBy
    keys on at most CMS_D × CMS_W = 256 distinct values, so map-side
    partial aggregation reduces every partition to ≤256 rows before the
    shuffle — a 100 TB stream becomes a 256-row exchange. The sketch is
    mergeable by construction (counts add), i.e. the same relation
    works as an incremental accumulator.

    Built in two aggregation levels: per-key exact counts first (the
    heavier aggregate, map-side combined, NO row multiplication), then
    the CMS_D-way explode runs over DISTINCT KEYS only before the tiny
    cell aggregate — identical cell values (counts are associative),
    but the ×CMS_D expansion touches #distinct-keys rows instead of
    every input row."""
    per_key = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("key_cnt")
    )
    rows = per_key.select(
        F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j"),
        "k",
        "key_cnt",
    )
    return (
        rows.groupBy("j", _cms_bucket(F.col("j"), F.col("k")))
        .agg(F.sum("key_cnt").alias("cnt"))
        # structural cap, declared for the broadcast-policy lint: the
        # cell domain is exactly CMS_D x CMS_W by construction
        .limit(CMS_D * CMS_W)
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """(key, cms_n) — point estimates: min over the CMS_D cells each
    key hashes into. The sketch side is ≤256 rows → broadcast; the
    probe is a narrow explode + broadcast join + per-key min.

    LEFT join + coalesce-to-0: a probe key absent from the sketched
    table hashes into cells no sketched key populated — an empty CMS
    cell means count 0, and an inner join would instead drop the cell
    (inflating the min past the true CMS estimate) or lose the key
    from the output entirely (review r5)."""
    probes = keys.select(
        F.col(key),
        F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j"),
    ).select(F.col(key), "j", _cms_bucket(F.col("j"), F.col(key)))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_n"))
    )


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch vs ground truth for the CMS_TOP_K heaviest
    users: (user_id, exact_n, cms_n, overestimate). CMS error is
    one-sided (cms_n >= exact_n always — collisions only add), which
    the column layout makes visible; the differential oracle mirrors
    the identical md5 hashing so the comparison is value-exact."""
    events = load_table(spark, sf_dir, "events")
    # the exact top-K subplan appears twice in the plan (probe side +
    # output's left side). Kept LAZY deliberately: every registry query
    # is a pure plan constructor (the harness builds all plans before
    # running any), so an eager collect here would fire a full scan at
    # construction time and snapshot exact_n out of sync with cms_n.
    # Spark's ReuseExchange dedupes the identical aggregate subtree
    # where it can; the residual double work is one extra pass over a
    # count-aggregate — acceptable for plan-purity.
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(CMS_TOP_K)
    )
    est = cms_estimate(cms_sketch(events, "user_id"), exact, "user_id")
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
    )


#: Bloom filter geometry: 4096 bits packed 32-per-BIGINT-word (bit
#: index stays < 32 — no sign-bit hazards in either engine), k = 3
#: hash functions derived from md5("j:key") like the CMS buckets.
#: 4096 bits over ~one quarter's ordering customers keeps the fill
#: rate low enough that "absent" is the common verdict while still
#: exhibiting a nonzero false-positive price at fixture scale.
BLOOM_BITS = 4096
BLOOM_WORD = 32
BLOOM_K = 3


def _bloom_pos(j: int, key_col: Column) -> Column:
    h = F.md5(F.concat(F.lit(f"{j}:"), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % BLOOM_BITS


def build_bloom(df: DataFrame, key: str) -> DataFrame:
    """(word, bits) — a Bloom filter over ``df[key]`` AS A RELATION:
    every row votes its k bit positions, and the filter is the bitwise
    OR per 32-bit word. Same scale property as the CMS sketch: the
    groupBy key space is ≤ BLOOM_BITS/BLOOM_WORD = 32 words, so
    map-side partial aggregation reduces any input to ≤32 rows per
    partition before the shuffle, and filters merge by construction
    (OR is associative/idempotent — no pre-distinct needed). This is
    the engine-level counterpart of Catalyst's runtime bloom pruning
    (test_plan_quality.py pins that one): a build-side you can
    persist, ship, and probe explicitly."""
    rows = df.select(
        F.explode(
            F.array(*[_bloom_pos(j, F.col(key)) for j in range(BLOOM_K)])
        ).alias("pos")
    )
    return (
        rows.select(
            F.floor(F.col("pos") / BLOOM_WORD).cast("int").alias("word"),
            # expr: the shiftleft/shiftright builtins take a literal
            # int shift, not a Column
            F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD} AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
        # structural cap, declared for the broadcast-policy lint: word
        # ids live in [0, BLOOM_BITS / BLOOM_WORD) by construction
        .limit(BLOOM_BITS // BLOOM_WORD)
    )


def q_bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership audit: build the filter over ONE QUARTER's ordering
    customers (the selective build side a bloom-pruned join ships),
    probe EVERY customer, cross-check against the exact answer — one
    row (n_customers, n_maybe, n_absent, n_false_positive). The absent
    count is the probe-side work the filter skips; the false-positive
    count is the price (zero false negatives by construction: every
    in-window customer must probe 'maybe' or the exact cross-check
    columns cannot reconcile)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    bloom = build_bloom(orders, "o_custkey")
    has_orders = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    ).select("c_custkey", F.lit(1).alias("has_orders"))
    probes = customer.select(
        "c_custkey",
        F.explode(
            F.array(*[_bloom_pos(j, F.col("c_custkey")) for j in range(BLOOM_K)])
        ).alias("pos"),
    ).select(
        "c_custkey",
        F.floor(F.col("pos") / BLOOM_WORD).cast("int").alias("word"),
        (F.col("pos") % BLOOM_WORD).cast("int").alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            "c_custkey",
            F.expr("(shiftright(coalesce(bits, 0L), bit)) % 2").alias("hit"),
        )
        .groupBy("c_custkey")
        .agg((F.sum("hit") == BLOOM_K).cast("int").alias("maybe"))
    )
    return (
        # No broadcast hint: has_orders is customer-cardinality (SF-grown),
        # forbidden by the broadcast policy (PLANS.md "Broadcast-hint
        # policy") — same class as the measured q_dq_audit 15.5x incident.
        # AQE still picks BHJ at fixture scale on its own.
        hits.join(has_orders, "c_custkey", "left")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("maybe").cast("long").alias("n_maybe"),
            F.sum(1 - F.col("maybe")).cast("long").alias("n_absent"),
            F.sum(
                F.when(
                    (F.col("maybe") == 1) & F.col("has_orders").isNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_false_positive"),
        )
    )


def _hex4_duck(expr: str) -> str:
    return (
        "("
        + " + ".join(
            f"(instr('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
            for i in range(4)
        )
        + ")"
    )


QUERIES["q_bloom_filter_probe"] = q_bloom_filter_probe

_BLOOM_POS_O = _hex4_duck("j.j::VARCHAR || ':' || o_custkey::VARCHAR") + f" % {BLOOM_BITS}"
_BLOOM_POS_C = _hex4_duck("j.j::VARCHAR || ':' || c_custkey::VARCHAR") + f" % {BLOOM_BITS}"

ORACLES["q_bloom_filter_probe"] = f"""
    WITH win AS (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
    ),
    bpos AS (
        SELECT {_BLOOM_POS_O} AS pos
        FROM win CROSS JOIN range({BLOOM_K}) j(j)
    ),
    bloom AS (
        SELECT pos // {BLOOM_WORD} AS word,
               bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD} AS INT)) AS bits
        FROM bpos GROUP BY 1
    ),
    probes AS (
        SELECT c_custkey, {_BLOOM_POS_C} // {BLOOM_WORD} AS word,
               {_BLOOM_POS_C} % {BLOOM_WORD} AS bit
        FROM customer CROSS JOIN range({BLOOM_K}) j(j)
    ),
    hits AS (
        SELECT c_custkey,
               CASE WHEN sum((coalesce(bits, 0) >> CAST(bit AS INT)) % 2)
                    = {BLOOM_K} THEN 1 ELSE 0 END AS maybe
        FROM probes LEFT JOIN bloom USING (word)
        GROUP BY c_custkey
    )
    SELECT count(1)::BIGINT AS n_customers,
           sum(maybe)::BIGINT AS n_maybe,
           sum(1 - maybe)::BIGINT AS n_absent,
           sum(CASE WHEN maybe = 1 AND NOT EXISTS (
                   SELECT 1 FROM win WHERE o_custkey = h.c_custkey
               ) THEN 1 ELSE 0 END)::BIGINT AS n_false_positive
    FROM hits h
"""


_CMS_BUCKET_DUCK = _hex4_duck("j::VARCHAR || ':' || user_id::VARCHAR") + f" % {CMS_W}"

ORACLES["q_cms_counts"] = f"""
    WITH hrows AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j),
    cells AS (
        SELECT j, {_CMS_BUCKET_DUCK} AS bucket, count(1)::BIGINT AS cnt
        FROM events, hrows GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, count(1)::BIGINT AS exact_n
        FROM events GROUP BY user_id
        ORDER BY exact_n DESC, user_id LIMIT {CMS_TOP_K}
    ),
    est AS (
        SELECT e.user_id, min(c.cnt)::BIGINT AS cms_n
        FROM exact e, hrows h, cells c
        WHERE c.j = h.j
          AND c.bucket = {_hex4_duck("h.j::VARCHAR || ':' || e.user_id::VARCHAR")} % {CMS_W}
        GROUP BY e.user_id
    )
    SELECT x.user_id, x.exact_n, est.cms_n,
           (est.cms_n - x.exact_n)::BIGINT AS overestimate
    FROM exact x JOIN est ON x.user_id = est.user_id
    ORDER BY x.exact_n DESC, x.user_id
"""

QUERIES["q_cms_counts"] = q_cms_counts


def q_cms_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from count-min sketches — the
    optimizer-statistics use of the same sketch relation: |R ⨝ S| on a
    key is estimated per hash row as Σ_bucket cntR·cntS (collisions
    only ADD, so each row over-estimates; the min over CMS_D rows is
    the classic one-sided estimate). Each table compresses to a ≤256-row
    relation BEFORE the cross-table multiply — at 100 TB the estimate
    costs two sketch builds (map-side-combined aggregates) and a
    256-row join, never a real join of the fact tables. The exact join
    count rides along for the error column; both are integer-exact, so
    the DuckDB oracle hash-matches."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    so = cms_sketch(orders, "o_orderkey").select(
        "j", "bucket", F.col("cnt").alias("cnt_o")
    )
    sl = cms_sketch(lineitem, "l_orderkey").select(
        "j", "bucket", F.col("cnt").alias("cnt_l")
    )
    # DECIMAL(38,0) products/sums: per-bucket counts at 10^11-row
    # tables reach ~1.5e9, so Σ cnt_o·cnt_l can pass 2^63 — a plain
    # long sum would silently wrap exactly at the scale the estimator
    # exists for (the oracle's HUGEINT sum never wraps; review r5).
    per_row = (
        so.join(sl, ["j", "bucket"])
        .groupBy("j")
        .agg(
            F.sum(
                F.col("cnt_o").cast("decimal(38,0)") * F.col("cnt_l").cast("decimal(38,0)")
            ).alias("row_est")
        )
    )
    est = per_row.agg(F.min("row_est").cast("decimal(38,0)").alias("cms_join_est"))
    exact = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey")).agg(
        F.count(F.lit(1)).alias("exact_join_n")
    )
    # Final rendering: internal math stays DECIMAL(38,0) (overflow-proof
    # at 100 TB), but the OUTPUT columns go decimal→string→double (house
    # style, see operators/timeseries.py total_value): DuckDB ships
    # DECIMAL(38,0)/HUGEINT to pandas as float64 while Spark returns
    # decimal objects — value-equal but hash-unstable (r10 red row).
    # Exact as long as the estimate fits 2^53 (far beyond sf1).
    return est.join(exact).select(
        F.col("cms_join_est").cast("string").cast("double").alias("cms_join_est"),
        "exact_join_n",
        (F.col("cms_join_est") - F.col("exact_join_n"))
        .cast("string")
        .cast("double")
        .alias("overestimate"),
    )


_CMS_BUCKET_O = _hex4_duck("j::VARCHAR || ':' || o_orderkey::VARCHAR") + f" % {CMS_W}"
_CMS_BUCKET_L = _hex4_duck("j::VARCHAR || ':' || l_orderkey::VARCHAR") + f" % {CMS_W}"

ORACLES["q_cms_join_estimate"] = f"""
    WITH hrows AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j),
    so AS (
        SELECT j, {_CMS_BUCKET_O} AS bucket, count(1)::BIGINT AS cnt_o
        FROM orders, hrows GROUP BY 1, 2
    ),
    sl AS (
        SELECT j, {_CMS_BUCKET_L} AS bucket, count(1)::BIGINT AS cnt_l
        FROM lineitem, hrows GROUP BY 1, 2
    ),
    per_row AS (
        -- DECIMAL(38,0): the HUGEINT sum is exact, and the output type
        -- mirrors the Spark side's overflow-proof decimal aggregation
        SELECT so.j, sum((cnt_o * cnt_l)::DECIMAL(38,0)) AS row_est
        FROM so JOIN sl ON so.j = sl.j AND so.bucket = sl.bucket
        GROUP BY so.j
    ),
    est AS (SELECT min(row_est)::DECIMAL(38,0) AS cms_join_est FROM per_row),
    exact AS (
        SELECT count(1)::BIGINT AS exact_join_n
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    -- decimal→VARCHAR→DOUBLE mirrors the Spark side's final rendering
    -- (hash-stable across engines; exact below 2^53)
    SELECT CAST(CAST(cms_join_est AS VARCHAR) AS DOUBLE) AS cms_join_est,
           exact_join_n,
           CAST(CAST((cms_join_est - exact_join_n)::DECIMAL(38,0) AS VARCHAR) AS DOUBLE)
               AS overestimate
    FROM est, exact
"""

QUERIES["q_cms_join_estimate"] = q_cms_join_estimate


# ---------------------------------------------------------------------------
# data-quality expectations audit
# ---------------------------------------------------------------------------

def _check_rows(name: str, violations, checked) -> tuple:
    return (
        F.lit(name).alias("check_name"),
        violations.cast("long").alias("n_violations"),
        checked.cast("long").alias("n_checked"),
    )


def dq_audit(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """(check_name, n_violations, n_checked) — declarative expectation
    checks over the warehouse tables: value-range assertions and
    referential-integrity orphans, the audit a pipeline runs after
    every load (the reference validates by eyeballing in-pipeline
    profiling logs, ref spark/transform_load.py:38-55 — this is that
    idea as a first-class, assertable operator).

    Scale shape: every range check rides ONE aggregate over its table
    scan (conditional sums — no per-check scans WITHIN a check family);
    each orphan check is a left-anti join against the referenced
    table's key projection with NO broadcast hint — the referenced
    side of a referential-integrity check is a fact-or-SF-grown
    relation (orders: 1.5M keys at a mere 10× replica), and a forced
    broadcast of it measured 15.5× wall at 10× (round 8) and would OOM
    executors at the 100 TB posture; AQE still picks BHJ whenever the
    key projection is genuinely small. The audit is NOT single-scan
    overall: the range aggregates and the orphan probes are separate
    passes, so each fact table is read 2-3× (ReuseExchange dedupes
    only identical subtrees) — size audit I/O accordingly. The tiny
    per-check rows union at the end (driver-sized, not data-sized)."""
    li = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("bad_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1).otherwise(0)
        ).alias("bad_disc"),
    )
    li_checks = li.select(
        F.explode(
            F.array(
                F.struct(*_check_rows("lineitem_quantity_range", F.col("bad_qty"), F.col("n"))),
                F.struct(*_check_rows("lineitem_discount_range", F.col("bad_disc"), F.col("n"))),
            )
        ).alias("c")
    ).select("c.*")
    ord_agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("bad_total"),
    )
    ord_checks = ord_agg.select(
        F.explode(
            F.array(
                F.struct(*_check_rows("orders_nonpositive_total", F.col("bad_total"), F.col("n"))),
            )
        ).alias("c")
    ).select("c.*")
    li_orphans = (
        lineitem.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
        .crossJoin(li.select(F.col("n").alias("n_li")))
        .select(*_check_rows("lineitem_orphan_orderkey", F.col("orphans"), F.col("n_li")))
    )
    ord_orphans = (
        orders.select("o_custkey")
        .join(
            customer.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
        .crossJoin(ord_agg.select(F.col("n").alias("n_ord")))
        .select(*_check_rows("orders_orphan_custkey", F.col("orphans"), F.col("n_ord")))
    )
    return li_checks.unionByName(ord_checks).unionByName(li_orphans).unionByName(
        ord_orphans
    )


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_audit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    ).orderBy("check_name")


ORACLES["q_dq_audit"] = """
    WITH li AS (
        SELECT count(1) AS n,
               sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS bad_qty,
               sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS bad_disc
        FROM lineitem
    ),
    ord AS (
        SELECT count(1) AS n,
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_total
        FROM orders
    ),
    li_orphans AS (
        -- NOT EXISTS, not NOT IN: NOT IN goes UNKNOWN on NULL keys
        -- while Spark's left_anti counts true orphans regardless.
        SELECT count(1) AS orphans FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    ),
    ord_orphans AS (
        SELECT count(1) AS orphans FROM orders od
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = od.o_custkey)
    )
    SELECT 'lineitem_quantity_range' AS check_name,
           bad_qty::BIGINT AS n_violations, n::BIGINT AS n_checked FROM li
    UNION ALL
    SELECT 'lineitem_discount_range', bad_disc::BIGINT, n::BIGINT FROM li
    UNION ALL
    SELECT 'orders_nonpositive_total', bad_total::BIGINT, n::BIGINT FROM ord
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', orphans::BIGINT,
           (SELECT n FROM li)::BIGINT FROM li_orphans
    UNION ALL
    SELECT 'orders_orphan_custkey', orphans::BIGINT,
           (SELECT n FROM ord)::BIGINT FROM ord_orphans
    ORDER BY check_name
"""

QUERIES["q_dq_audit"] = q_dq_audit


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics
# ---------------------------------------------------------------------------

def column_stats(df: DataFrame, columns: list[str]) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_str, max_str) — the
    ANALYZE TABLE statistics relation a cost-based optimizer feeds on
    (null fraction, NDV, bounds), computed in ONE pass over the scan:
    every column's aggregates ride the same single aggregate node (no
    per-column scans), then the wide 1-row result unpivots via a
    literal struct array (driver-sized). Min/max surface as strings so
    one schema covers every column type, exactly how catalog stats
    tables store them. NDV here is exact count(distinct) — swap in
    approx_count_distinct at 100 TB for one-pass sketched NDV
    ([[q_approx_distinct]] is that path)."""
    aggs = []
    fractional = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    }
    for c in columns:
        # fractional bounds go through DECIMAL(38,6) before the string
        # cast: each engine's default double→string formatting flips to
        # scientific notation at different thresholds, while fixed-point
        # decimal renders identically everywhere.
        mn, mx = F.min(F.col(c)), F.max(F.col(c))
        if c in fractional:
            mn = mn.cast("decimal(38,6)")
            mx = mx.cast("decimal(38,6)")
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            mn.cast("string").alias(f"{c}__mn"),
            mx.cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_str"),
                F.col(f"{c}__mx").alias("max_str"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(entries).alias("s")).select("s.*")


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scan widening MEASURED and REJECTED here (r13): the Expand(×5)
    # partial aggregate runs single-task over the one-split fixture,
    # but the round-robin exchange + its 3.2 MB partial-agg shuffle
    # cost exactly offset the parallelism win (interleaved A/B 1.02
    # over 4 reps with fresh plans; the same-plan-object rerun that
    # suggested 0.61 was reusing the exchange's shuffle files).
    events = load_table(spark, sf_dir, "events")
    return column_stats(
        events, ["event_id", "user_id", "event_type", "value"]
    ).orderBy("col_name")


ORACLES["q_table_stats"] = """
    WITH wide AS (
        SELECT count(1) AS n,
               count(event_id) AS nn_event_id, count(DISTINCT event_id) AS nd_event_id,
               min(event_id)::VARCHAR AS mn_event_id, max(event_id)::VARCHAR AS mx_event_id,
               count(user_id) AS nn_user_id, count(DISTINCT user_id) AS nd_user_id,
               min(user_id)::VARCHAR AS mn_user_id, max(user_id)::VARCHAR AS mx_user_id,
               count(event_type) AS nn_event_type, count(DISTINCT event_type) AS nd_event_type,
               min(event_type)::VARCHAR AS mn_event_type, max(event_type)::VARCHAR AS mx_event_type,
               count(value) AS nn_value, count(DISTINCT value) AS nd_value,
               min(value)::DECIMAL(38,6)::VARCHAR AS mn_value,
               max(value)::DECIMAL(38,6)::VARCHAR AS mx_value
        FROM events
    )
    SELECT 'event_id' AS col_name, n::BIGINT AS n_rows, (n - nn_event_id)::BIGINT AS n_nulls,
           nd_event_id::BIGINT AS n_distinct, mn_event_id AS min_str, mx_event_id AS max_str FROM wide
    UNION ALL
    SELECT 'event_type', n::BIGINT, (n - nn_event_type)::BIGINT,
           nd_event_type::BIGINT, mn_event_type, mx_event_type FROM wide
    UNION ALL
    SELECT 'user_id', n::BIGINT, (n - nn_user_id)::BIGINT,
           nd_user_id::BIGINT, mn_user_id, mx_user_id FROM wide
    UNION ALL
    SELECT 'value', n::BIGINT, (n - nn_value)::BIGINT,
           nd_value::BIGINT, mn_value, mx_value FROM wide
    ORDER BY col_name
"""

QUERIES["q_table_stats"] = q_table_stats


# ---------------------------------------------------------------------------
# MAD outlier detection — the flagging complement of winsorize_profile
# ---------------------------------------------------------------------------

MAD_K = 3


def mad_outliers(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """(key, n, med, mad, n_outliers, outlier_frac) — robust per-key
    outlier detection: a row is an outlier when
    ``|x - median| > MAD_K * MAD`` (median absolute deviation), the
    standard curation gate for numeric feature columns where mean/std
    are themselves dragged by the outliers being hunted
    (the flagging complement of [[q_winsorized_means]]' location
    estimate).

    Engine-exactness discipline (same as winsorize_profile): median
    and MAD are LOWER-MEDIAN ORDER STATISTICS — exact stored doubles
    selected at rank ``(n + 1) div 2``, never interpolated percentiles
    (interpolation arithmetic diverges at ~1 ulp across engines and a
    threshold comparison against a diverged boundary flips rows).
    Ties are rank-order-safe: every row inside a tie run carries the
    same value, so whichever of them lands on the target rank yields
    the identical double. The deviation |x - med|, the threshold
    MAD_K*mad, and the comparison are single IEEE ops — bit-identical
    across engines. outlier_frac is the raw IEEE quotient (no rounding
    anywhere).

    Scale posture: TWO-PASS EXACT ORDER STATISTIC — rank rows with
    ``row_number() OVER (PARTITION BY key ORDER BY value)`` and keep
    the one at the median rank, then repeat on |x - med| for the MAD.
    No per-key array ever materializes (the r7 collect_list posture
    held the whole key group in one executor array; a skewed key blew
    the grouped-sort memory profile) — window sort state is
    spill-to-disk, so a hot key degrades to disk sort instead of OOM.
    Truly unbounded keys still take the approx-sketch path
    [[q_approx_quantiles]]. Final flag pass is partial-aggregated with
    the key-sized med/mad relation broadcast."""
    vals = df.where(F.col(value_col).isNotNull())
    w_rank = Window.partitionBy(key).orderBy(value_col)
    w_all = Window.partitionBy(key)
    med = (
        vals.select(
            key,
            F.col(value_col),
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(key, "n", F.col(value_col).alias("med"))
    )
    w_dev = Window.partitionBy(key).orderBy("dev")
    stats = (
        vals.join(med, key)
        .select(
            key,
            "n",
            "med",
            F.abs(F.col(value_col) - F.col("med")).alias("dev"),
        )
        .select(
            key,
            "n",
            "med",
            "dev",
            F.row_number().over(w_dev).alias("rn"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(key, "n", "med", F.col("dev").alias("mad"))
    )
    flagged = (
        vals.join(stats, key)
        .groupBy(key, "n", "med", "mad")
        .agg(
            F.sum(
                (
                    F.abs(F.col(value_col) - F.col("med"))
                    > F.lit(float(MAD_K)) * F.col("mad")
                ).cast("bigint")
            ).alias("n_outliers")
        )
        .select(
            key,
            "n",
            "med",
            "mad",
            "n_outliers",
            (F.col("n_outliers").cast("double") / F.col("n").cast("double")).alias(
                "outlier_frac"
            ),
        )
        .orderBy(key)
    )
    return flagged


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return mad_outliers(events, "event_type", "value")


ORACLES["q_mad_outliers"] = f"""
    WITH vals AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
    b AS (
        SELECT event_type,
               list(value ORDER BY value) AS vs,
               count(1)::BIGINT AS n
        FROM vals GROUP BY event_type
    ),
    med AS (
        SELECT event_type, n, vs,
               vs[CAST((n + 1) // 2 AS INT)] AS med
        FROM b
    ),
    stats AS (
        SELECT event_type, n, med,
               (list_sort(list_transform(vs, x -> abs(x - med))))
                   [CAST((n + 1) // 2 AS INT)] AS mad
        FROM med
    )
    SELECT v.event_type, s.n, s.med, s.mad,
           sum(CASE WHEN abs(v.value - s.med) > {MAD_K}.0 * s.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           sum(CASE WHEN abs(v.value - s.med) > {MAD_K}.0 * s.mad
                    THEN 1 ELSE 0 END)::DOUBLE / s.n::DOUBLE AS outlier_frac
    FROM vals v JOIN stats s USING (event_type)
    GROUP BY 1, 2, 3, 4
    ORDER BY v.event_type
"""

QUERIES["q_mad_outliers"] = q_mad_outliers
