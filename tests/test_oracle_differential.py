"""Every declared query with an oracle must match DuckDB on the same
parquet — the local mirror of the driver's correctness gate."""

import pytest

from tfl_bikes_data_pipeline_spark import registry

from .oracle_utils import assert_matches_oracle, assert_within_bounds, duckdb_con

ORACLE_QUERIES = sorted(n for n in registry.QUERIES if n in registry.ORACLES)
BOUND_QUERIES = sorted(n for n in registry.QUERIES if n in registry.BOUND_ORACLES)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


#: queries that RUN the streaming engine inside the builder — their
#: returned frame is a drained memory/parquet sink, so the interesting
#: plan (pinned separately in test_streaming/test_plan_quality) is not
#: the one `explain` would show here.
_STREAMING = ("q_stream_", "q_session_window")

#: plan anti-patterns no declared query may ever contain: an unbounded
#: corpus cartesian, or a row-at-a-time Python UDF (Arrow-batched
#: MapInPandas / ArrowEvalPython remain allowed — they are the sanctioned
#: Python seam). Enforced suite-wide on every oracle run, not just the
#: hand-picked plans in test_plan_quality.
_FORBIDDEN_NODES = ("CartesianProduct", "BatchEvalPython")


def _assert_plan_clean(df, name: str) -> None:
    import contextlib
    import io

    from tfl_bikes_data_pipeline_spark.lint import (
        bnlj_policy_violations,
        broadcast_policy_violations,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for node in _FORBIDDEN_NODES:
        assert node not in plan, f"{name}: forbidden plan node {node}"
    # broadcast policy as a lint (r8 verdict item 2): no explicit
    # broadcast hint may build from an unbounded SF-grown scan — the
    # q_dq_audit / q_bloom_filter_probe incident class, caught at test
    # time instead of by manual replica sweeps.
    violations = broadcast_policy_violations(df)
    assert not violations, f"{name}: {violations}"
    # same policy on the physical plan: a forced BNLJ (non-equi join)
    # with an unbounded SF-grown build side is an OOM at scale even
    # without a hint, and AQE cannot demote it (r9 verdict task 4).
    violations = bnlj_policy_violations(df)
    assert not violations, f"{name}: {violations}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = registry.QUERIES[name](spark, sf_dir)
    if not name.startswith(_STREAMING):
        _assert_plan_clean(df, name)
    assert_matches_oracle(df, con, registry.ORACLES[name], name)


@pytest.mark.parametrize("name", BOUND_QUERIES)
def test_sketch_query_within_error_bounds(spark, sf_dir, con, name):
    # sketch-valued queries (HLL, GK quantiles) can never hash-match an
    # exact engine; their gate check is a DuckDB-computed [lo, hi]
    # interval per cell, derived from the exact aggregates.
    df = registry.QUERIES[name](spark, sf_dir)
    _assert_plan_clean(df, name)
    assert_within_bounds(df, con, registry.BOUND_ORACLES[name], name)


def test_all_queries_return_rows(spark, sf_dir):
    # rows-only smoke for queries with neither a hash nor a bound oracle
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES or name in registry.BOUND_ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_gate_rejects_int_vs_float_dtype_mismatch(spark, con):
    # driver-faithfulness canary (r10 verdict task 2): the driver's value
    # hash renders 1 != 1.0, so the local gate must FAIL a value-equal
    # int-vs-float pairing instead of coercing — this exact laxness is
    # how r10's two red rows shipped green locally.
    df = spark.sql("SELECT CAST(1 AS BIGINT) AS x")
    with pytest.raises(AssertionError, match="dtype parity"):
        assert_matches_oracle(df, con, "SELECT 1.0::DOUBLE AS x", "planted")
    # and the matched-type twins still pass
    assert_matches_oracle(df, con, "SELECT 1::BIGINT AS x", "planted_int")
    assert_matches_oracle(
        spark.sql("SELECT CAST(1.5 AS DOUBLE) AS x"),
        con,
        "SELECT 1.5::DOUBLE AS x",
        "planted_float",
    )


def test_every_query_is_value_checked():
    # every registered query carries a value-level check in
    # this gate — a hash oracle or a bounded-error oracle, never both.
    unchecked = set(registry.QUERIES) - set(registry.ORACLES) - set(registry.BOUND_ORACLES)
    assert not unchecked, f"queries with no value-level oracle: {sorted(unchecked)}"
    overlap = set(registry.ORACLES) & set(registry.BOUND_ORACLES)
    assert not overlap, f"queries in both oracle maps: {sorted(overlap)}"
