"""Fuzzy string matching — blocked edit-distance similarity join.

Entity resolution over names/titles is the string-side sibling of the
embedding near-dup family in ``dedup.py``: find record pairs whose
text differs by small edits (typos, re-keyed suppliers, OCR noise).
The naive form is an O(n²) cross join; the scalable form is the
classic **blocking → verify** shape used by every record-linkage
system:

1. *Block*: derive a cheap equality key (here the first token of the
   name) and self-join on it — candidate pairs collapse from n² to
   Σ(block²), a shuffle-equality join Catalyst executes as a plain
   SMJ/broadcast, never a cartesian.
2. *Verify*: run the expensive metric (``levenshtein``, JVM builtin,
   whole-stage codegen — no Python) only on candidates, keep pairs
   under the threshold.

Scale notes:
- The block key must keep blocks bounded: first-token blocking over a
  ~90-word vocabulary keeps Σ(block²)/n² ≈ 1/90. A skewed block (one
  token covering half the corpus) re-creates the n² problem locally —
  at 100 TB, compose with ``functions.skew.salted_join`` or use two
  blocking passes (token + length band).
- ``a.key < b.key`` dedups unordered pairs inside the join condition,
  so it prunes during the merge, not in a post-filter over 2× rows.
- Output is a per-block aggregate (counts), not the pair list — at
  scale you'd sink pairs to a table; the declared query keeps the
  result driver-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

#: Max edit distance for a verified fuzzy pair.
FUZZY_MAX_DIST = 4


def fuzzy_pairs(
    df: DataFrame, key: str, text: str, max_dist: int = FUZZY_MAX_DIST
) -> DataFrame:
    """Candidate pairs (a_key, b_key, dist) with
    ``levenshtein(a.text, b.text) <= max_dist``, blocked on the first
    token of ``text``. ``key`` must be unique."""
    blocked = df.select(
        F.col(key).alias("k"),
        F.col(text).alias("t"),
        F.split(F.col(text), " ").getItem(0).alias("blk"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")))
        .withColumn("dist", F.levenshtein(F.col("a.t"), F.col("b.t")))
        .where(F.col("dist") <= max_dist)
        .select(
            F.col("a.blk").alias("blk"),
            F.col("a.k").alias("a_key"),
            F.col("b.k").alias("b_key"),
            "dist",
        )
    )


# ---------------------------------------------------------------------------
# Declared query + oracle
# ---------------------------------------------------------------------------

def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block fuzzy-match profile of part names: how many near-pairs
    (edit distance ≤ 4) and how many exact-duplicate names each
    first-token block contains."""
    part = load_table(spark, sf_dir, "part")
    pairs = fuzzy_pairs(part, "p_partkey", "p_name")
    return (
        pairs.groupBy("blk")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("dist") == 0, 1).otherwise(0)).alias("n_exact"),
            F.min("dist").alias("min_dist"),
        )
        .orderBy("blk")
    )


ORACLES: dict[str, str] = {
    # DuckDB's levenshtein is the same unit-cost edit distance as
    # Spark's (integer, case-sensitive), so the verify step is
    # engine-portable; the blocking join is plain SQL.
    "q_fuzzy_pairs": """
        WITH blocked AS (
            SELECT p_partkey AS k, p_name AS t,
                   split_part(p_name, ' ', 1) AS blk
            FROM part
        ),
        pairs AS (
            SELECT a.blk, levenshtein(a.t, b.t) AS dist
            FROM blocked a JOIN blocked b
              ON a.blk = b.blk AND a.k < b.k
            WHERE levenshtein(a.t, b.t) <= 4
        )
        SELECT blk, count(1)::BIGINT AS n_pairs,
               sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
               min(dist)::INT AS min_dist
        FROM pairs GROUP BY blk ORDER BY blk
    """,
}

QUERIES = {"q_fuzzy_pairs": q_fuzzy_pairs}

BENCH = ["q_fuzzy_pairs"]
