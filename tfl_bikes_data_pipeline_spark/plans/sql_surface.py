"""SQL-string analyst surface + warehouse DDL (SURVEY.md §2.2 K5/K6,
§2.10 C1/C2).

The reference's analyst interface is literal SQL: a denormalizing view
(``sql/make_view.sql:3-32``) created once and queried by dashboards, and
tables pre-created empty from declared schemas with MONTH partitioning
(``airflow/dags/spark_transform_load.py:130-157,196-211``). Spark-first:
``CREATE OR REPLACE TEMP VIEW`` over registered table views, and
``CREATE TABLE ... USING PARQUET PARTITIONED BY ... LOCATION`` — the
catalog tracks partitions, so inserts land as month directories and
queries partition-prune for free.

``q_sql_view_topk`` drives the whole surface inside the correctness
gate: register base views → view DDL → aggregate SQL over the view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import register_views

#: The role-playing star view as SQL (reference make_view.sql shape:
#: fact ⟕ each dim, nation joined twice). No broadcast hints — the
#: scaling dims must be AQE's call, same policy as queries.q_star_view.
STAR_VIEW_SQL = """
    CREATE OR REPLACE TEMP VIEW star_view AS
    SELECT concat_ws('_', l.l_orderkey, l.l_linenumber) AS line_key,
           l.l_quantity,
           s.s_name, p.p_name, o.o_orderstatus,
           c.c_name, c.c_mktsegment,
           cn.n_name AS c_nation_name,
           sn.n_name AS s_nation_name
    FROM lineitem l
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    LEFT JOIN part p     ON l.l_partkey = p.p_partkey
    LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    LEFT JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
"""


def create_star_view(spark: SparkSession, sf_dir: str) -> None:
    """K6/C2: the persistent denormalizing view, as DDL."""
    register_views(
        spark, sf_dir, "lineitem", "supplier", "part", "orders", "customer", "nation"
    )
    spark.sql(STAR_VIEW_SQL)


def create_partitioned_table(
    spark: SparkSession,
    name: str,
    columns_ddl: str,
    partition_cols: list[str],
    location: str,
) -> None:
    """K5: pre-create an empty partitioned warehouse table from a
    declared schema (reference empty-table DDL with MONTH partitioning).
    ``columns_ddl`` must include the partition columns."""
    cols = ", ".join(partition_cols)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({columns_ddl}) "
        f"USING PARQUET PARTITIONED BY ({cols}) LOCATION '{location}'"
    )


def q_sql_view_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard-shaped aggregate over the DDL-created view (the
    reference's Data-Studio query path)."""
    create_star_view(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_nation_name, CAST(count(1) AS BIGINT) AS cnt
        FROM star_view
        GROUP BY s_nation_name
        ORDER BY cnt DESC, s_nation_name
        LIMIT 10
        """
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — big-spender orders, defined
    relative to each customer's own average spend. Catalyst de-
    correlates this into an aggregate + join (no per-row re-execution,
    unlike a naive interpreter); the threshold arithmetic goes through
    the exact-DECIMAL-sum discipline so both engines compare against
    bit-identical doubles."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.8 * (
            SELECT CAST(CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
                   / count(1)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o.o_orderkey
        """
    )


QUERIES = {
    "q_sql_view_topk": q_sql_view_topk,
    "q_scalar_subquery": q_scalar_subquery,
}

ORACLES: dict[str, str] = {
    "q_scalar_subquery": """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.8 * (
            SELECT CAST(CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / count(1)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o.o_orderkey
    """,
    "q_sql_view_topk": """
        SELECT sn.n_name AS s_nation_name, count(1)::BIGINT AS cnt
        FROM lineitem l
        LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        LEFT JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY sn.n_name
        ORDER BY cnt DESC, s_nation_name
        LIMIT 10
    """,
}
