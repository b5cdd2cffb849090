"""Graph metrics over the near-dup similarity graph: degree profile
and triangle counting — the classic distributed-graph operators a
curation stack runs to understand its duplicate structure (a heavy-
tailed degree profile or a triangle burst flags template families and
mirror clusters that pairwise counts alone hide).

Triangle counting is the textbook edge-join formulation, made
shuffle-safe the standard way: orient every edge low→high, join
oriented edges on the shared middle vertex to enumerate wedges
(a<b<c), then semi-join the closing edge. Each triangle is produced
exactly once. Work is Σ deg²(v) on the WEDGE side — the oriented-edge
trick caps the join fan-out by each vertex's OUT-degree under the
total order, the same degree-capping rationale as the dedup df-cap.
Degree stats are one aggregate over the symmetrized edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table


def degree_stats(pairs: DataFrame) -> DataFrame:
    """(degree, n_nodes) — the degree histogram of the undirected pair
    graph; one symmetrize union + two aggregates."""
    sym = pairs.select(F.col("doc_a").alias("node")).unionAll(
        pairs.select(F.col("doc_b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


def triangle_count(pairs: DataFrame) -> DataFrame:
    """1-row (n_triangles, n_edges, n_wedges): triangles via oriented
    wedge join + closing-edge check; each triangle counted once because
    a<b<c has exactly one generating wedge (a-b, b-c).

    ONE wedge-join pass: the closing edge attaches as a LEFT join with
    a match flag, so triangles and wedges count in the same aggregate
    (a semi join + separate wedge count would run the O(Σdeg²) join
    twice); the deduped edge relation is persisted across its three
    readers for the duration of the plan (released at the next
    [[dedup]]-lifecycle invocation)."""
    from .dedup import _retain

    # no release here: the incoming pair plan may itself read relations
    # the dedup lifecycle retained (q_dedup_minhash_lsh's shingle sets)
    # — releasing them now would silently force full recomputation.
    # This _retain joins the same generation; the NEXT top-level dedup
    # invocation frees everything.
    e = _retain(
        pairs.select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi"),
        ).distinct()
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = ab.join(bc, "b").select("a", "b", "c")
    closing = e.select(
        F.col("lo").alias("a"), F.col("hi").alias("c"), F.lit(1).alias("closed")
    )
    flagged = wedges.join(closing, ["a", "c"], "left")
    counts = flagged.agg(
        F.count("closed").alias("n_triangles"),
        F.count(F.lit(1)).alias("n_wedges"),
    )
    return (
        counts.crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .select("n_triangles", "n_edges", "n_wedges")
    )


def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the verified MinHash-LSH near-dup graph."""
    from .dedup import q_dedup_minhash_lsh

    return degree_stats(q_dedup_minhash_lsh(spark, sf_dir))


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph — transitivity evidence
    (near-dup similarity is approximately transitive, so template
    families show up as dense triangle clusters)."""
    from .dedup import q_dedup_minhash_lsh

    return triangle_count(q_dedup_minhash_lsh(spark, sf_dir))


def _lsh_pairs_sql() -> str:
    from .dedup import ORACLES as DEDUP_ORACLES

    return DEDUP_ORACLES["q_dedup_minhash_lsh"]


ORACLES: dict[str, str] = {}
ORACLES["q_graph_degrees"] = f"""
    WITH pairs AS ({_lsh_pairs_sql()}),
    sym AS (
        SELECT doc_a AS node FROM pairs
        UNION ALL
        SELECT doc_b AS node FROM pairs
    ),
    deg AS (SELECT node, count(1) AS degree FROM sym GROUP BY node)
    SELECT degree::BIGINT AS degree, count(1)::BIGINT AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
"""
ORACLES["q_graph_triangles"] = f"""
    WITH pairs AS ({_lsh_pairs_sql()}),
    e AS (
        SELECT DISTINCT least(doc_a, doc_b) AS lo, greatest(doc_a, doc_b) AS hi
        FROM pairs
    ),
    wedges AS (
        SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
        FROM e ab JOIN e bc ON ab.hi = bc.lo
    )
    SELECT (SELECT count(1) FROM wedges w
            WHERE EXISTS (SELECT 1 FROM e WHERE e.lo = w.a AND e.hi = w.c)
           )::BIGINT AS n_triangles,
           (SELECT count(1) FROM e)::BIGINT AS n_edges,
           (SELECT count(1) FROM wedges)::BIGINT AS n_wedges
"""

QUERIES = {
    "q_graph_degrees": q_graph_degrees,
    "q_graph_triangles": q_graph_triangles,
}

BENCH = ["q_graph_triangles"]
