"""Distributed order statistics — exact global row numbers per group
WITHOUT funneling any group through a single task.

``Window.partitionBy(k).orderBy(...)`` hash-shuffles every row of a
group to ONE task: correct, and fine when the partition key is
high-cardinality, but a low-cardinality key (5 event types) at 100 TB
means 5 tasks each sorting 20 TB — the single-partition-window
pathology. The r10 100× sweep measured the declared ntile query at
22.7s/10M rows on exactly this shape.

This module computes the same exact ranks with the classic
distributed recipe, all within one range exchange:

1. ``repartitionByRange(key, *order)`` + ``sortWithinPartitions`` —
   rows arrive globally sorted across partitions (range boundaries),
   locally sorted within each; every task holds a contiguous slice of
   each key's order. ONE shuffle, the same exchange a sorted write
   pays, parallelism = #partitions regardless of key cardinality.
2. A metadata pass counts rows per (physical partition, key) — output
   is bounded by #partitions × #keys (tiny), collected to the driver,
   prefix-summed into per-(partition, key) START OFFSETS, broadcast.
3. An Arrow-batched ``mapInPandas`` assigns ``rn = offset + local
   cumcount`` in one vectorized pass per batch (pandas groupby
   cumcount — no per-row Python).

The sorted relation is persisted (MEMORY_AND_DISK) between the
metadata pass and the rank pass so the range exchange runs once.

From ``rn`` and the per-key totals (a tiny literal map expression —
no join at all), the SQL distribution-rank family falls out exactly:

* ``ntile(n)``: SQL semantics — base size s = N div n, remainder
  r = N mod n, first r buckets carry s+1 rows;
* ``percent_rank`` = (rank−1)/(N−1) (a unique ORDER BY tie-break makes
  rank == rn; single-row groups define 0.0);
* ``cume_dist`` = rn/N (again exact under a unique tie-break).
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterator

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_by_group(
    df: DataFrame, part_col: str, order_cols: list[str], num_partitions: int | None = None
) -> tuple[DataFrame, dict]:
    """(df + ``rn`` column, {key: group row count}) — exact 1-based row
    number of every row within its ``part_col`` group under
    ``order_cols``, distributed per the module recipe. ``order_cols``
    must end in a unique tie-break for deterministic ranks. The
    returned frame is UNPERSISTED lazily by Spark's LRU; callers that
    chain further passes may re-persist."""
    spark = df.sparkSession
    n_parts = num_partitions or max(
        df.rdd.getNumPartitions(), spark.sparkContext.defaultParallelism
    )
    cols = [F.col(part_col)] + [F.col(c) for c in order_cols]
    d = (
        df.repartitionByRange(n_parts, *cols)
        .sortWithinPartitions(part_col, *order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # metadata pass: #partitions × #keys rows — driver-bounded by
    # construction (the partition count and the key cardinality, never
    # the data volume). Guarded: this recipe exists for LOW-cardinality
    # keys (where the plain window is the pathology); a high-cardinality
    # key must fail loudly here, BEFORE the collect, not OOM the driver
    # — and the caller should just use Window.partitionBy, which is
    # already scale-correct when groups are small.
    grouped = (
        d.select(F.spark_partition_id().alias("pid"), part_col)
        .groupBy("pid", part_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_cells = grouped.count()
    if n_cells > 2_000_000:
        raise ValueError(
            f"ranked_by_group: {n_cells} (partition, {part_col}) cells — "
            "this distributed-rank recipe is for low-cardinality group "
            "keys; a high-cardinality key is exactly the case where "
            "Window.partitionBy already scales (small groups, no "
            "single-task funnel)"
        )
    pid_counts = grouped.collect()
    per_key: dict = defaultdict(list)
    for r in pid_counts:
        per_key[r[part_col]].append((r["pid"], r["n"]))
    offsets: dict = {}
    totals: dict = {}
    for key, lst in per_key.items():
        lst.sort()
        acc = 0
        for pid, n in lst:
            offsets[(pid, key)] = acc
            acc += n
        totals[key] = acc
    bc = spark.sparkContext.broadcast(offsets)

    # fresh StructType: StructType.add MUTATES the receiver, and
    # d.schema is the live schema object of d itself
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(d.schema.fields) + [T.StructField("rn", T.LongType())]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vectorized local rank: rows arrive key-sorted, so per-key
            # cumcount + the running start carried across batches is rn
            local = pdf.groupby(part_col, sort=False).cumcount() + 1
            starts = []
            for key, n in pdf[part_col].value_counts(sort=False).items():
                base = seen.get(key)
                if base is None:
                    base = bc.value.get((pid, key), 0)
                starts.append((key, base))
                seen[key] = base + int(n)
            base_map = dict(starts)
            out = pdf.copy()
            out["rn"] = local.values + pdf[part_col].map(base_map).values
            yield out

    return d.mapInPandas(op, schema=out_schema), totals


def _totals_expr(part_col: str, totals: dict) -> Column:
    """Per-key group size as a LITERAL map expression — #keys is small
    by the caller's contract, so no join (not even a broadcast one) is
    needed to attach N. Empty input → a typed NULL (an argless
    create_map() is map<void,void> and fails analysis against a real
    key column; there are no rows for the value to matter anyway)."""
    if not totals:
        return F.lit(None).cast("long")
    pairs: list[Column] = []
    for key, n in totals.items():
        pairs.append(F.lit(key))
        pairs.append(F.lit(n))
    return F.create_map(*pairs)[F.col(part_col)]


def distribution_ranks(
    df: DataFrame, part_col: str, order_cols: list[str], n_buckets: int
) -> DataFrame:
    """df + (rn, n_part, quartile-style ``bucket``, ``pct_rank``,
    ``cume``) with EXACT SQL window semantics (ntile / percent_rank /
    cume_dist over ``partition by part_col order by order_cols``),
    computed scale-out per the module recipe."""
    ranked, totals = ranked_by_group(df, part_col, order_cols)
    n = F.lit(n_buckets)
    N = _totals_expr(part_col, totals)
    s = (N / n).cast("long")  # base bucket size (floor)
    r = N % n  # first r buckets carry s+1 rows
    rn = F.col("rn")
    head = r * (s + 1)
    bucket = (
        F.when(rn <= head, ((rn - 1) / (s + 1)).cast("long"))
        .otherwise(r + ((rn - head - 1) / s).cast("long"))
        + 1
    )
    pct = F.when(N > 1, (rn - 1).cast("double") / (N - 1).cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        ranked.withColumn("n_part", N)
        .withColumn("bucket", bucket.cast("int"))
        .withColumn("pct_rank", pct)
        .withColumn("cume", rn.cast("double") / N.cast("double"))
    )
