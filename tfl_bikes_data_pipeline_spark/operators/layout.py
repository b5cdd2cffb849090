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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

#: bits interleaved per dimension. 20 bits covers key domains to ~1M
#: per dimension (lineitem partkey reaches 200k·SF — sf5 fits); the
#: z-value spans 2·bits = 40 bits, well inside BIGINT. Larger domains
#: must pre-shift to their TOP bits (z-order needs only enough
#: resolution to separate files, not to order every row uniquely) —
#: and silently truncating the HIGH bits would quietly destroy the
#: locality the layout exists for, so :func:`zorder_expr` carries a
#: hard assert_true guard: a key outside [0, 2^bits) fails the job
#: with a message instead of producing a degenerate layout.
ZORDER_BITS = 20


def zorder_expr(colx: str, coly: str, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit i of x lands at position 2i, bit i of y at
    2i+1. Pure shift/and/or arithmetic — one codegen'd expression, no
    UDF, and textually mirrorable in ANSI SQL (the oracle builds the
    identical sum)."""
    guard = (
        f"coalesce(assert_true({colx} >= 0 and {colx} < {1 << bits} "
        f"and {coly} >= 0 and {coly} < {1 << bits}, "
        f"'zorder: key outside [0, 2^{bits}) — pre-shift large domains "
        f"to their top bits'), 0)"
    )
    terms = [guard]
    for i in range(bits):
        terms.append(f"(shiftleft(shiftright({colx}, {i}) & 1, {2 * i}))")
        terms.append(f"(shiftleft(shiftright({coly}, {i}) & 1, {2 * i + 1}))")
    return F.expr(" + ".join(terms))


def zorder_sql(colx: str, coly: str, bits: int = ZORDER_BITS) -> str:
    """The DuckDB mirror of :func:`zorder_expr` — same bit arithmetic,
    same term order."""
    terms = []
    for i in range(bits):
        terms.append(f"((({colx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({coly} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    colx: str,
    coly: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-order curve of (colx, coly): one range exchange on the z-value
    (the identical shuffle cost of any sorted layout) + an in-partition
    sort, so every output file covers a contiguous z-range — a small
    min/max box in BOTH dimensions, which is what lets row-group stats
    prune 2-D predicates. The z column is dropped before the write;
    the layout IS the artifact."""
    z = zorder_expr(colx, coly, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


#: z-bucket granularity for the declared query: top SHIFT bits of the
#: z-value form the bucket (a 2^(SHIFT/2) × 2^(SHIFT/2) grid cell).
ZBUCKET_SHIFT = 24


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
