"""The synthetic partsupp seam (plans/tpch_suite.py): Q2/Q11/Q16/Q20
run over a table DERIVED from part x supplier-count, so the one thing
that must never drift is the derivation itself — the DuckDB oracle CTE
builds the same rows from the same formula, and any change to either
side alone is a silent value divergence on all four queries."""

import pytest

from tfl_bikes_data_pipeline_spark.plans.tpch_suite import _partsupp

from .conftest import SF_SMOKE


def test_partsupp_derivation_invariants(spark):
    """Exactly 4 DISTINCT suppliers per part (the (p*4+i) % S stripes
    are consecutive integers mod S, distinct for any S >= 4), value
    ranges match the formula's moduli, and a hand-computed row pins the
    constants against refactor drift."""
    ps = _partsupp(spark, SF_SMOKE).cache()
    try:
        n_parts = ps.select("ps_partkey").distinct().count()
        assert ps.count() == 4 * n_parts
        assert (
            ps.select("ps_partkey", "ps_suppkey").distinct().count() == 4 * n_parts
        ), "duplicate (part, supplier) pair — supplier stripes collided"
        from pyspark.sql import functions as F

        bounds = ps.agg(
            F.min("ps_availqty"), F.max("ps_availqty"),
            F.min("ps_supplycost_cents"), F.max("ps_supplycost_cents"),
        ).first()
        assert 1 <= bounds[0] and bounds[1] <= 9999
        assert 1 <= bounds[2] and bounds[3] <= 100000
        # hand arithmetic for part 7, i=2 at the smoke SF (S=10):
        # suppkey = (7*4+2) % 10 = 0; availqty = (7*17 + 0*31) % 9999 + 1
        # = 120; cents = (7*13 + 0*7) % 100000 + 1 = 92.
        row = ps.where(
            (F.col("ps_partkey") == 7) & (F.col("ps_suppkey") == 0)
        ).first()
        assert row is not None
        assert row.ps_availqty == 120 and row.ps_supplycost_cents == 92
    finally:
        ps.unpersist()


@pytest.mark.parametrize(
    "name",
    [
        "q_min_cost_supplier",
        "q_important_stock",
        "q_parts_supplier_count",
        "q_excess_stock_suppliers",
    ],
)
def test_partsupp_query_plans_broadcast_dims(spark, sf_dir, name):
    """All four partsupp queries keep the house plan shape: dims and
    1-row scalars broadcast, no CartesianProduct anywhere (the only
    nested-loop allowed is the broadcast 1-row scalar merge)."""
    from tfl_bikes_data_pipeline_spark import registry
    from .test_plan_quality import plan_of

    plan = plan_of(registry.QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
    assert "BroadcastExchange" in plan, f"{name} shuffles its dims"
