"""Z-order (Morton-curve) write layout — multi-dimensional data
skipping for the 100 TB warehouse.

A month-partitioned warehouse prunes on ONE dimension (the partition
key). Queries that filter on two independent high-cardinality columns
(supplier AND part, user AND time bucket) skip nothing inside a
partition unless the FILE layout clusters both: sorting by one column
scatters the other. Interleaving the bits of both columns (the Morton
/ Z-order curve — the technique behind Delta Lake's OPTIMIZE ZORDER
and ClickHouse's mortonEncode) gives every file a narrow min/max range
on BOTH columns at once, so parquet row-group statistics prune
two-dimensional predicates.

Everything here is exact integer arithmetic (shift/or), JVM-side
whole-stage-codegen expressions — no UDF — and the DuckDB oracle
mirrors the same arithmetic, so the z-values are value-hashed like any
other query output. The WRITE path is one `repartitionByRange` on the
z-value (a range exchange — the same shuffle a sort-by-one-column
layout pays) plus `sortWithinPartitions`; the skipping benefit is
measured in tests/test_layout.py by reading parquet footer min/max
stats for both layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.zorder import ZORDER_BITS, zorder_expr, zorder_sql
from ..functions.zorder import write_zordered as _write_zordered
from ..tables import load_table

__all__ = ["ZORDER_BITS", "zorder_expr", "zorder_sql", "write_zordered"]


def write_zordered(
    df: DataFrame,
    path: str,
    colx: str,
    coly: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Raw-domain Z-order write — delegates to the single Morton engine
    in ``functions/zorder.py`` with ``rank="raw"`` (r9 verdict finding
    1: this module and ``functions/zorder`` carried two parallel
    ``write_zordered`` implementations; the layout machinery now lives
    in exactly one place, this wrapper only pins the raw rank mode this
    module's oracle query profiles)."""
    _write_zordered(df, path, colx, coly, n_files, bits=bits, rank="raw")


#: z-bucket granularity for the declared query: dropping the low SHIFT
#: bits of the 2·ZORDER_BITS-bit z-value leaves a 16-bit bucket grid
#: (256 × 256 cells), the same granularity at any ZORDER_BITS — the
#: r10 bits widening (20 → 24) moved the shift with it so the bucket
#: relation's cardinality didn't 256× under the reader's feet.
ZBUCKET_SHIFT = 2 * ZORDER_BITS - 16


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order locality profile of the lineitem (suppkey, partkey)
    plane: every row's Morton code, bucketed by its top bits, with
    per-bucket row counts and the min/max box of BOTH dimensions —
    the relation a layout optimizer inspects to size files. The
    defining property (each bucket's box is narrow in BOTH columns at
    once) is what the value hash pins; the write path itself
    (``write_zordered``) is exercised with footer-stat measurements in
    tests/test_layout.py."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    return (
        li.withColumn("z", zorder_expr("l_suppkey", "l_partkey"))
        .groupBy(F.expr(f"shiftright(z, {ZBUCKET_SHIFT})").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
        )
        .orderBy("z_bucket")
    )


ORACLES = {
    "q_zorder_layout": f"""
        WITH z AS (
            SELECT l_suppkey, l_partkey,
                   {zorder_sql("l_suppkey", "l_partkey")} AS zv
            FROM lineitem
        )
        SELECT (zv >> {ZBUCKET_SHIFT}) AS z_bucket,
               count(1)::BIGINT AS n_rows,
               min(l_suppkey)::BIGINT AS min_supp,
               max(l_suppkey)::BIGINT AS max_supp,
               min(l_partkey)::BIGINT AS min_part,
               max(l_partkey)::BIGINT AS max_part
        FROM z GROUP BY z_bucket ORDER BY z_bucket
    """,
}

QUERIES = {
    "q_zorder_layout": q_zorder_layout,
}
