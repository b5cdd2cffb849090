"""The broadcast-policy lint itself (tfl_bikes_data_pipeline_spark/lint.py):
planted violations must fire, sanctioned shapes must pass.

The policy this enforces was set by two measured incidents — a forced
broadcast of an SF-grown key set ran 15.5× at a 10× replica
(q_dq_audit, r8) and the same class recurred in q_bloom_filter_probe —
and both were found by MANUAL replica sweeps. The lint runs inside
every oracle-differential test (suite-wide), so the next one fails at
commit time.
"""

from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.lint import broadcast_policy_violations
from tfl_bikes_data_pipeline_spark.tables import load_table


def test_planted_violation_fires(spark, sf_dir):
    """A forced broadcast of an SF-grown relation (the exact q_dq_audit
    incident shape) must be reported."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    key_set = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    df = customer.join(F.broadcast(key_set), "c_custkey", "left_semi")
    v = broadcast_policy_violations(df)
    assert len(v) == 1 and "orders" in v[0], v


def test_planted_violation_fires_on_direct_table(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    df = events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
    v = broadcast_policy_violations(df)
    assert len(v) == 1 and "customer" in v[0], v


def test_fixed_dim_broadcast_passes(spark, sf_dir):
    """nation/region are fixed-cardinality by the data model — hints on
    them are the sanctioned use."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    df = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    assert broadcast_policy_violations(df) == []


def test_global_aggregate_broadcast_passes(spark, sf_dir):
    """A 1-row scalar derived from an SF-grown scan is bounded by the
    global aggregate between the hint and the scan."""
    orders = load_table(spark, sf_dir, "orders")
    total = orders.agg(F.sum("o_totalprice").alias("t"))
    df = orders.crossJoin(F.broadcast(total))
    assert broadcast_policy_violations(df) == []


def test_limit_declares_structural_bound(spark, sf_dir):
    """.limit(n) is the declared-bound idiom: the same key-set broadcast
    that fails un-bounded passes once the plan itself caps its rows."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    key_set = (
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct().limit(100)
    )
    df = customer.join(F.broadcast(key_set), "c_custkey", "left_semi")
    assert broadcast_policy_violations(df) == []


def test_unhinted_join_passes(spark, sf_dir):
    """No hint → nothing to lint: optimizer-chosen broadcasts re-derive
    from measured sizes per run and are AQE's call by policy."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    df = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    )
    assert broadcast_policy_violations(df) == []


def test_bounding_below_hint_but_above_scan_counts(spark, sf_dir):
    """The bound may sit anywhere between the hint and the scan — a
    hinted projection OVER a limited subtree is compliant."""
    events = load_table(spark, sf_dir, "events")
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(10)
        .select("user_id")
    )
    df = events.join(F.broadcast(top), "user_id")
    assert broadcast_policy_violations(df) == []


def test_literal_bound_filter_declares_bound(spark, sf_dir):
    """A Filter carrying a literal upper bound on an attribute (the
    seed-centroid / seed-plane idiom) declares the bound WITHOUT the
    GlobalLimit + single-partition exchange a mid-plan .limit(n)
    physically plans."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.where(F.col("vec_id") < 40).select("vec_id", "embedding")
    df = emb.crossJoin(F.broadcast(seeds.select(F.col("vec_id").alias("sid"))))
    assert broadcast_policy_violations(df) == []


def test_non_bound_filter_still_fires(spark, sf_dir):
    """A filter WITHOUT a literal upper bound (null check, equality on
    a data column) does not bound cardinality — the hint must still be
    flagged."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    key_set = (
        orders.where(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    df = customer.join(F.broadcast(key_set), "c_custkey", "left_semi")
    v = broadcast_policy_violations(df)
    assert len(v) == 1 and "orders" in v[0], v


def test_hint_inside_subquery_expression_fires(spark, sf_dir):
    """Hints living inside scalar-subquery plans are reachable only via
    subqueries() — children() alone never visits them."""
    from tfl_bikes_data_pipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    df = spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_acctbal > (
            SELECT avg(o_totalprice) FROM orders
            JOIN (SELECT /*+ BROADCAST(lineitem) */ l_orderkey
                  FROM lineitem) USING (o_orderkey)
        )
        """.replace("USING (o_orderkey)", "ON o_orderkey = l_orderkey")
    )
    v = broadcast_policy_violations(df)
    assert len(v) == 1 and "lineitem" in v[0], v


def test_date_timestamp_fraction_literals_are_not_bounds(spark, sf_dir):
    """r9 ADVICE: '(event_date < DATE'2020-01-01')' etc. must NOT count
    as a literal row bound — the digit prefix of a date/timestamp/
    fractional literal bounds nothing. Each shape must still fire."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    for pred in (
        F.col("ts") < F.lit("2020-01-01").cast("timestamp"),
        F.to_date("ts") < F.lit("2020-01-01").cast("date"),
        F.col("value") < F.lit(0.5),
    ):
        key_set = events.where(pred).select(
            F.col("user_id").alias("c_custkey")
        ).distinct()
        df = customer.join(F.broadcast(key_set), "c_custkey", "left_semi")
        v = broadcast_policy_violations(df)
        assert len(v) == 1 and "events" in v[0], (pred, v)


def test_bound_filter_above_join_does_not_silence(spark, sf_dir):
    """r9 ADVICE: a literal bound filter is honored only directly over
    a leaf scan — sitting ABOVE a join of SF-grown scans it bounds one
    attribute's range, not the subtree's cardinality."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey)
    bounded_late = joined.where(F.col("o_orderkey") < 1000).select(
        F.col("c_custkey").alias("k")
    )
    df = customer.crossJoin(F.broadcast(bounded_late.distinct()))
    v = broadcast_policy_violations(df)
    assert v, "bound filter above a join must not silence the lint"


def test_bound_literal_cap_tightened(spark, sf_dir):
    """A declared bound of 50M rows is an OOM, not a bound — the cap is
    now 1M (r9 verdict finding 3)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    huge = events.where(F.col("event_id") < 2_000_000).select(
        F.col("user_id").alias("c_custkey")
    )
    df = customer.join(F.broadcast(huge.distinct()), "c_custkey", "left_semi")
    v = broadcast_policy_violations(df)
    assert len(v) == 1 and "events" in v[0], v


def test_planted_bnlj_violation_fires(spark, sf_dir):
    """A forced BNLJ (non-equi join, broadcastable-looking side actually
    SF-grown) must be reported by the physical-plan walk even though no
    explicit hint exists for the logical walk to see."""
    from tfl_bikes_data_pipeline_spark.lint import bnlj_policy_violations

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    df = customer.join(
        F.broadcast(orders.select("o_custkey", "o_totalprice")),
        customer.c_acctbal < orders.o_totalprice,
    )
    v = bnlj_policy_violations(df)
    assert len(v) == 1 and "orders" in v[0], v


def test_planted_bnlj_bound_filter_above_aggregate_fires(spark, sf_dir):
    """ADVICE r10: a bound-LOOKING FilterExec (``cnt#L < 1000``) sitting
    ABOVE a grouped aggregate bounds an attribute's range, not the
    subtree's row count — the physical walk must apply the same
    sits-on-leaf discipline as the logical walk instead of silencing
    the whole SF-grown subtree."""
    from tfl_bikes_data_pipeline_spark.lint import bnlj_policy_violations

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") < 1000)  # range bound, NOT a row bound
    )
    df = customer.join(F.broadcast(per_cust), customer.c_acctbal < per_cust.cnt)
    v = bnlj_policy_violations(df)
    assert len(v) == 1 and "orders" in v[0], v


def test_bounded_bnlj_passes(spark, sf_dir):
    """The sanctioned BNLJ shape — a bounded-build scalar/centroid merge
    (global aggregate or literal-bound build side) — stays clean."""
    from tfl_bikes_data_pipeline_spark.lint import bnlj_policy_violations

    orders = load_table(spark, sf_dir, "orders")
    emb = load_table(spark, sf_dir, "embeddings")
    scalar = orders.agg(F.avg("o_totalprice").alias("avg_price"))
    assert bnlj_policy_violations(orders.crossJoin(F.broadcast(scalar))) == []
    seeds = emb.where(F.col("vec_id") < 40).select(F.col("vec_id").alias("sid"))
    assert bnlj_policy_violations(emb.crossJoin(F.broadcast(seeds))) == []
