"""Literal-SQL twins of the analyst query surface (VERDICT r4 item 7).

The reference's analyst interface is raw SQL (``sql/aggregations.sql:
1-79``); the repo proves each query's SEMANTICS via the DataFrame
builders in ``plans.queries``, but SURVEY §7.1 also promises style
parity — an analyst porting their SQL verbatim. Each ``q_sql_*`` here
is the same query expressed as one ``spark.sql`` string over the
registered table views, sharing the existing DuckDB oracle (identical
aliases, exact-DECIMAL sum discipline, tie-broken ORDER BY), so the
differential gate proves the SQL strings end-to-end.

Catalyst compiles both styles to the same logical plan, so the scale
posture (broadcast hints on fixed-cardinality dims, partial aggs,
pushed predicates) carries over — fixed-dim hints move into ``/*+ BROADCAST */``
(SF-grown sides like part/customer are UNHINTED per the broadcast policy)
comment form, the one syntactic difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import register_views
from .queries import BAL_BAND_SQL, PRICE_BAND_SQL, ORACLES as _ANALYST_ORACLES

#: twin name → (tables to register, Spark SQL text). The oracle of each
#: twin IS the oracle of its DataFrame counterpart — one semantics, two
#: front-ends.
_TWINS: dict[str, tuple[tuple[str, ...], str, str]] = {
    # reference sql/aggregations.sql:2-5 (top-10 rentals per bike)
    "q_sql_topk_count": (
        ("lineitem",),
        "q_topk_count",
        """
        SELECT l_suppkey, CAST(count(1) AS BIGINT) AS cnt
        FROM lineitem
        GROUP BY l_suppkey
        ORDER BY cnt DESC, l_suppkey
        LIMIT 10
        """,
    ),
    # reference sql/aggregations.sql:8-14 (popular destinations, 2021)
    "q_sql_topk_join_count": (
        ("lineitem", "part"),
        "q_topk_join_count",
        """
        SELECT p_name, CAST(count(1) AS BIGINT) AS cnt
        FROM lineitem l
        LEFT JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
        GROUP BY p_name
        ORDER BY cnt DESC, p_name
        LIMIT 10
        """,
    ),
    # reference sql/aggregations.sql:17-26 (3-4AM destinations)
    "q_sql_filter_hour_topk": (
        ("events", "customer"),
        "q_filter_hour_topk",
        """
        SELECT c_name, CAST(count(1) AS BIGINT) AS cnt
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        WHERE hour(e.ts) = 3
        GROUP BY c_name
        ORDER BY cnt DESC, c_name
        LIMIT 10
        """,
    ),
    # reference sql/aggregations.sql:28-34 (journeys per hour)
    "q_sql_group_by_hour": (
        ("events",),
        "q_group_by_hour",
        """
        SELECT CAST(hour(ts) AS INT) AS hour, CAST(count(1) AS BIGINT) AS cnt
        FROM events
        GROUP BY CAST(hour(ts) AS INT)
        ORDER BY hour
        """,
    ),
    # reference sql/aggregations.sql:36-42 (7-day trailing average,
    # RANGE frame over UNIX_DATE)
    "q_sql_moving_avg": (
        ("events",),
        "q_moving_avg",
        """
        WITH daily AS (
            SELECT user_id,
                   CAST(datediff(to_date(ts), DATE '1970-01-01') AS INT) AS day_num,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS daily_value
            FROM events
            GROUP BY user_id, CAST(datediff(to_date(ts), DATE '1970-01-01') AS INT)
        )
        SELECT user_id, day_num,
               CAST(CAST(sum(CAST(daily_value AS DECIMAL(18,6))) OVER w AS STRING) AS DOUBLE)
                   / count(1) OVER w AS avg_7d
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day_num
                     RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)
        """,
    ),
    # reference sql/aggregations.sql:44-66 (CASE bucketing CTE)
    "q_sql_case_bucket_count": (
        ("orders",),
        "q_case_bucket_count",
        f"""
        SELECT {PRICE_BAND_SQL} AS price_band, o_orderstatus,
               CAST(count(1) AS BIGINT) AS cnt
        FROM orders
        GROUP BY {PRICE_BAND_SQL}, o_orderstatus
        ORDER BY price_band, o_orderstatus
        """,
    ),
    # reference sql/aggregations.sql:68-71 (2-key bucketed group count)
    "q_sql_bucket_by_location": (
        ("customer",),
        "q_bucket_by_location",
        f"""
        SELECT CAST(c_nationkey AS INT) AS c_nationkey, {BAL_BAND_SQL} AS bal_band,
               CAST(count(1) AS BIGINT) AS cnt
        FROM customer
        GROUP BY CAST(c_nationkey AS INT), {BAL_BAND_SQL}
        ORDER BY c_nationkey, bal_band
        """,
    ),
    # reference sql/make_view.sql:3-32 (the denormalizing star view,
    # nation role-played twice; fixed-cardinality dims broadcast-hinted)
    "q_sql_star_view": (
        ("lineitem", "supplier", "part", "orders", "customer", "nation"),
        "q_star_view",
        """
        SELECT /*+ BROADCAST(cn), BROADCAST(sn) */
               concat_ws('_', l.l_orderkey, l.l_linenumber) AS line_key,
               l.l_quantity,
               s.s_name, p.p_name, o.o_orderstatus,
               c.c_name, c.c_mktsegment,
               cn.n_name AS c_nation_name,
               sn.n_name AS s_nation_name
        FROM lineitem l
        LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        LEFT JOIN part p     ON l.l_partkey = p.p_partkey
        LEFT JOIN (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders) o
               ON l.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        LEFT JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        """,
    ),
}


def _make_twin(tables: tuple[str, ...], sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, *tables)
        return spark.sql(sql)

    return run


QUERIES: dict[str, object] = {}
ORACLES: dict[str, str] = {}
for _name, (_tables, _oracle_of, _sql) in _TWINS.items():
    QUERIES[_name] = _make_twin(_tables, _sql)
    ORACLES[_name] = _ANALYST_ORACLES[_oracle_of]
