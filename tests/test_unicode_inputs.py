"""Unicode parity: every oracled query that reads the ``documents``
table must stay HASH-IDENTICAL to its DuckDB oracle when documents
carry non-ASCII text (CJK, emoji, accented Latin, a combining mark).
Both engines tokenize on spaces, hash md5 over UTF-8 bytes, and the
one byte-length-vs-codepoint seam (multimodal payloads) was pinned in
round 5 — this gate keeps the whole text surface honest about it.

A full-registry probe (all 184 oracled queries) passed with zero
divergence when this gate was introduced; the permanent gate runs the
documents-reading subset (the only queries whose inputs the injection
changes) to keep suite time bounded.
"""

import pytest

from tfl_bikes_data_pipeline_spark import registry
from tfl_bikes_data_pipeline_spark.tables import TABLE_NAMES

#: appended to every 5th document: accents, CJK, emoji, combining char
UNICODE_SUFFIX = " héllo 世界 🚲 naïve café" + chr(0x301)


def _doc_reading_oracled():
    return sorted(
        name
        for name, sql in registry.ORACLES.items()
        if "documents" in sql
    )


@pytest.fixture(scope="session")
def unicode_sf_dir(tmp_path_factory):
    import duckdb

    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("uni_sf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        if t == "documents":
            con.execute(
                f"COPY (SELECT doc_id, "
                f"CASE WHEN doc_id % 5 = 0 THEN text || ? ELSE text END AS text, "
                f"lang, source, n_chars FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)",
                [UNICODE_SUFFIX],
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(out)


@pytest.mark.parametrize("name", _doc_reading_oracled())
def test_unicode_text_matches_oracle(spark, unicode_sf_dir, name):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from .oracle_utils import assert_matches_oracle, duckdb_con

    con = duckdb_con(unicode_sf_dir)
    df = registry.QUERIES[name](spark, unicode_sf_dir)
    assert_matches_oracle(df, con, registry.ORACLES[name], name)
