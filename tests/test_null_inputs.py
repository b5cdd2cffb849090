"""NULL-payload robustness: every declared query must execute against
tables where ~10% of non-key payload columns (text, embedding, label,
event_type, value, props, comments) are NULL. The engine's convention
is the SQL-aggregate one: a row whose payload is NULL is ABSENT from
computations that need that payload (vector ops skip NULL embeddings
at the `_vecs` seam, media ops skip NULL blobs at `attach_payload`,
the token budget counts NULL text as zero tokens, the XLSX round-trip
maps empty cells back to NULL) — never a crash.

Found-and-fixed by this gate: np.vstack/np.stack over NULL vectors
(brute-arrow, covariance, PCA), driver-side Lloyd/offset iterations
over NULL rows (kmeans, refined IVF, budget-select), codec calls on
NULL blobs (all multimodal ops), and an ANSI NumberFormatException on
the XLSX empty-cell read-back.
"""

import pytest

from tfl_bikes_data_pipeline_spark import registry
from tfl_bikes_data_pipeline_spark.tables import TABLE_NAMES

#: non-key payload columns nulled per table (~10% of rows by key hash)
NULLABLE = {
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding", "label"],
    "events": ["event_type", "value", "props"],
    "orders": ["o_comment", "o_orderpriority"],
    "lineitem": ["l_comment", "l_shipmode"],
}


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory):
    import duckdb

    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("null_sf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
        ).df()["column_name"].tolist()
        exprs = [
            (
                f"CASE WHEN hash({cols[0]}) % 10 = 0 THEN NULL ELSE {c} END AS {c}"
                if c in NULLABLE.get(t, [])
                else c
            )
            for c in cols
        ]
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_survives_null_payloads(spark, null_sf_dir, name):
    df = registry.QUERIES[name](spark, null_sf_dir)
    assert df.count() >= 0


def _null_parity_names():
    """Queries whose ORACLES mirror the null-absence convention (the
    whole vector-ops module via the `_vecs` seam mirror, the payload
    multimodal ops, the token budget, the XLSX round-trip) — for these
    the differential holds on NULL-bearing data too, not just the
    null-free driver fixtures. The remaining queries' oracles are
    defined over payload-complete rows and carry the crash-resistance
    check above only."""
    from tfl_bikes_data_pipeline_spark.operators import similarity

    extra = [
        "q_multimodal_meta",
        "q_multimodal_framesample",
        "q_multimodal_phash_pairs",
        "q_budget_select",
        "q_xlsx_roundtrip",
    ]
    return sorted(
        n for n in (*similarity.QUERIES, *extra) if n in registry.ORACLES
    )


@pytest.mark.parametrize("name", _null_parity_names())
def test_null_semantics_match_oracle(spark, null_sf_dir, name):
    import duckdb

    from .oracle_utils import assert_matches_oracle

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{null_sf_dir}/{t}.parquet'"
        )
    df = registry.QUERIES[name](spark, null_sf_dir)
    assert_matches_oracle(df, con, registry.ORACLES[name], name)
