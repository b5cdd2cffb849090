"""Empty-input robustness: EVERY declared query must build and execute
against zero-row copies of all tables, returning a (possibly empty)
typed relation instead of crashing. Real pipelines hit empty inputs
constantly — a fresh partition, a filtered-out source, a dry ingest
window — and an operator that throws on empty is an operator that
pages someone at 3am.

Found-and-fixed by this gate: p_incremental_append (read-back of a
zero-partition write cannot infer schema), q_ann_brute_arrow
(np.vstack of an empty query set), q_embed_pca_project (KeyError on
the empty covariance cell map), q_xlsx_roundtrip (createDataFrame
schema inference on a zero-row pandas frame).
"""

import pytest

from tfl_bikes_data_pipeline_spark import registry
from tfl_bikes_data_pipeline_spark.tables import TABLE_NAMES


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    import duckdb

    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("empty_sf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 0) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = registry.QUERIES[name](spark, empty_sf_dir)
    # count() forces full execution; the result may be empty or carry
    # degenerate aggregate rows (a global agg over empty input is one
    # row) — both are fine, crashing is not.
    assert df.count() >= 0
