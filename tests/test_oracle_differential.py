"""Every declared query with an oracle must match DuckDB on the same
parquet — the local mirror of the driver's correctness gate."""

import pytest

from tfl_bikes_data_pipeline_spark import registry

from .oracle_utils import assert_matches_oracle, duckdb_con

ORACLE_QUERIES = sorted(n for n in registry.QUERIES if n in registry.ORACLES)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, con, registry.ORACLES[name], name)


def test_all_queries_return_rows(spark, sf_dir):
    # rows-only smoke for queries without an oracle
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, name
