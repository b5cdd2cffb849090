"""SQL DDL surface: view DDL ≡ DataFrame plan, partitioned CREATE TABLE."""

import tempfile
import uuid

from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.plans import queries, sql_surface


def test_view_ddl_matches_dataframe_star_view(spark, sf_dir):
    sql_surface.create_star_view(spark, sf_dir)
    via_sql = spark.table("star_view")
    via_df = queries.q_star_view(spark, sf_dir)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert via_sql.count() == via_df.count()
    # spot-check a grouped projection agrees
    a = {r["s_nation_name"]: r["cnt"] for r in
         via_sql.groupBy("s_nation_name").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    b = {r["s_nation_name"]: r["cnt"] for r in
         via_df.groupBy("s_nation_name").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert a == b


def test_create_partitioned_table_roundtrip(spark):
    loc = tempfile.mkdtemp(prefix="ddl_table_")
    name = f"fact_test_{uuid.uuid4().hex[:6]}"
    sql_surface.create_partitioned_table(
        spark, name, "event_id BIGINT, value DOUBLE, ym STRING", ["ym"], loc
    )
    spark.sql(f"INSERT INTO {name} VALUES (1, 1.5, '202101'), (2, 2.5, '202102')")
    # partition pruning applies: one-month read touches one partition dir
    got = spark.sql(f"SELECT * FROM {name} WHERE ym = '202101'").collect()
    assert [(r.event_id, r.value) for r in got] == [(1, 1.5)]
    parts = spark.sql(f"SHOW PARTITIONS {name}").collect()
    assert {r[0] for r in parts} == {"ym=202101", "ym=202102"}
    spark.sql(f"DROP TABLE {name}")
