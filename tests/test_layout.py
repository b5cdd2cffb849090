"""Z-order layout: correctness of the Morton arithmetic and the
measured data-skipping property (footer min/max stats prune 2-D
predicates that a single-column sort layout cannot)."""

import glob
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.operators.layout import (
    ZORDER_BITS,
    q_zorder_layout,
    write_zordered,
    zorder_expr,
)


def _py_morton(x: int, y: int, bits: int = ZORDER_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_expr_matches_reference_interleave(spark):
    """The codegen'd shift/or expression must compute the textbook
    Morton interleave bit-for-bit, including at power-of-two
    boundaries and the top of the bit budget."""
    vals = [0, 1, 2, 3, 255, 256, 65535, 1234, 40000]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_expr("x", "y")
    )
    for r in df.collect():
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y)


def _file_boxes(path: str, colx: str, coly: str) -> list[tuple]:
    """Per-file (min, max) boxes of both columns from parquet FOOTER
    statistics — what an engine's scan pruning actually reads."""
    boxes = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo_x = min(
            md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)
        )
        hi_x = max(
            md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)
        )
        lo_y = min(
            md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups)
        )
        hi_y = max(
            md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups)
        )
        boxes.append((lo_x, hi_x, lo_y, hi_y))
    return boxes


def test_zorder_layout_skips_2d_predicates(spark, sf_dir):
    """The measured claim: under a 2-D box predicate, the z-ordered
    layout leaves most files prunable by footer stats while a
    sort-by-one-column layout keeps a narrow range on ONLY the sort
    column — its files span the full domain of the other column, so a
    selective predicate on that column prunes (almost) nothing."""
    from tfl_bikes_data_pipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    max_supp = li.agg(F.max("l_suppkey")).first()[0]
    max_part = li.agg(F.max("l_partkey")).first()[0]
    n_files = 16

    zdir = tempfile.mkdtemp(prefix="zorder_")
    sdir = tempfile.mkdtemp(prefix="sorted_")
    write_zordered(li, zdir, "l_suppkey", "l_partkey", n_files)
    (
        li.repartitionByRange(n_files, "l_suppkey")
        .sortWithinPartitions("l_suppkey")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    # the claim z-order exists for: a predicate selective on the
    # NON-sort column. The suppkey-sorted layout's files each span the
    # full partkey domain, so a narrow partkey slice prunes (almost)
    # nothing there; the z layout's files carry a bounded partkey box,
    # so most of them skip.
    py0, py1 = max_part // 2, max_part // 2 + max(max_part // 16, 1)

    def files_hit(path):
        boxes = _file_boxes(path, "l_suppkey", "l_partkey")
        return sum(
            1 for _lo_x, _hi_x, lo_y, hi_y in boxes
            if not (hi_y < py0 or lo_y > py1)
        ), len(boxes)

    z_hit, z_total = files_hit(zdir)
    s_hit, s_total = files_hit(sdir)
    assert s_hit >= s_total - 1, (
        f"premise broken: the 1-D sort should NOT prune the partkey "
        f"slice ({s_hit}/{s_total} hit)"
    )
    assert z_hit < s_hit, f"z-order pruned nothing extra ({z_hit} vs {s_hit})"
    assert z_hit <= z_total // 2, (
        f"z-order layout should skip at least half the files "
        f"({z_hit}/{z_total} hit)"
    )


def test_zorder_query_buckets_are_boxes(spark, sf_dir):
    """Every z-bucket of the declared query must be a bounded box in
    BOTH dimensions: the bucket's (max-min) extent in each column is at
    most the grid-cell width implied by the bucket shift — the locality
    property that makes the curve useful for skipping."""
    from tfl_bikes_data_pipeline_spark.operators.layout import ZBUCKET_SHIFT

    rows = q_zorder_layout(spark, sf_dir).collect()
    assert rows, "fixture lineitem should produce at least one bucket"
    # the bucket fixes every interleaved bit from position ZBUCKET_SHIFT
    # up, so each dimension is free only in its low SHIFT/2 bits inside
    # one bucket — derive the bound from the constant, never hardcode it
    # (the r10 24-bit widening moved the shift and a hardcoded 2^12
    # silently stopped testing the invariant; r10 review finding)
    cell = 1 << (ZBUCKET_SHIFT // 2)
    for r in rows:
        assert r.max_supp - r.min_supp < cell, r
        assert r.max_part - r.min_part < cell, r

    # the fixture's key domains are far smaller than one grid cell, so
    # the assertion above is satisfied degenerately there; exercise the
    # box invariant for real on a synthetic pair spanning the full
    # 24-bit domain (multiple buckets, extents near the cell width)
    import pyspark.sql.functions as F

    from tfl_bikes_data_pipeline_spark.functions.zorder import zorder_expr

    # pmod, not abs-then-%: abs(Integer.MIN_VALUE) stays negative in
    # Spark, and a negative key would trip zorder_expr's domain guard on
    # an unlucky hash (r10 advisor finding)
    wide = spark.range(20_000).select(
        F.pmod(F.hash(F.col("id"), F.lit("zx")), F.lit(1 << 24)).alias("x"),
        F.pmod(F.hash(F.col("id"), F.lit("zy")), F.lit(1 << 24)).alias("y"),
    )
    boxes = (
        wide.withColumn("z", zorder_expr("x", "y"))
        .groupBy(F.expr(f"shiftright(z, {ZBUCKET_SHIFT})").alias("b"))
        .agg(
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
        )
        .collect()
    )
    assert len(boxes) > 8, "wide domain must split into many buckets"
    for r in boxes:
        assert r.max_x - r.min_x < cell, r
        assert r.max_y - r.min_y < cell, r
