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
