"""XML station-feed ingest (SURVEY.md §2.1 S8) + typed station
dimension (reference ``spark/transform_load.py:130-161``).

The reference parses the TfL station XML feed driver-side with
ElementTree, projecting 5 fields per ``<station>`` node
(``airflow/dags/ingest_bike_data.py:208-257``), then casts id→int and
lat/long→DECIMAL(8,6)/(9,6) in Spark. Same split here: XML parse stays
at the driver edge (the feed is ~800 nodes — parsing it distributed
would be ceremony, not scale), everything after ``createDataFrame`` is a
Spark plan. For a feed too large for one driver, the same ``_parse_node``
logic drops into ``mapInPandas`` over a DataFrame of XML chunks — the
typed-cast plan below is unchanged.

``q_xml_stations`` runs the full path in the correctness gate: supplier
rows → XML document → ElementTree parse → typed dimension with decimal
coords; the oracle derives the same dimension relationally.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table
from ..tmputil import sweep_tmpdir

STATION_FIELDS = ("id", "name", "terminalName", "lat", "long")

#: all-string parse schema — types applied by explicit casts, same
#: discipline as the CSV path (sources/raw.py).
STATION_RAW_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in STATION_FIELDS]
)


def parse_station_xml(spark: SparkSession, xml_path: str) -> DataFrame:
    """``<stations><station><id>..</id>...`` → all-string DataFrame.
    Missing child nodes become NULL (the feed drifts)."""
    root = ET.parse(xml_path).getroot()
    rows = []
    for node in root.iter("station"):
        rows.append(
            tuple(
                (child.text if (child := node.find(f)) is not None else None)
                for f in STATION_FIELDS
            )
        )
    return spark.createDataFrame(rows, STATION_RAW_SCHEMA)


def typed_stations(raw: DataFrame) -> DataFrame:
    """Typed dimension: int id, DECIMAL(8,6)/(9,6) coords
    (reference transform_load.py:149-154)."""
    return raw.select(
        F.col("id").cast("int").alias("station_id"),
        F.col("name").alias("station_name"),
        F.col("terminalName").alias("terminal_name"),
        F.col("lat").cast("decimal(8,6)").alias("latitude"),
        F.col("long").cast("decimal(9,6)").alias("longitude"),
    )


def write_stations_xml(spark: SparkSession, sf_dir: str, xml_path: str) -> str:
    """Render supplier rows as a station feed document (the synthetic
    stand-in for the TfL endpoint; supplier is station-scale, ~1k rows)."""
    suppliers = (
        load_table(spark, sf_dir, "supplier")
        .select(
            F.col("s_suppkey").cast("string").alias("id"),
            F.col("s_name").alias("name"),
            F.concat(F.lit("T"), F.col("s_suppkey")).alias("terminalName"),
            (F.col("s_suppkey") % 90).cast("string").alias("lat"),
            ((F.col("s_suppkey") * 3) % 180).cast("string").alias("long"),
        )
        .collect()
    )
    root = ET.Element("stations")
    for row in suppliers:
        node = ET.SubElement(root, "station")
        for f in STATION_FIELDS:
            ET.SubElement(node, f).text = row[f]
    ET.ElementTree(root).write(xml_path, encoding="unicode")
    return xml_path


def q_xml_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    xml_path = os.path.join(sweep_tmpdir("stations_xml_"), "stations.xml")
    write_stations_xml(spark, sf_dir, xml_path)
    typed = typed_stations(parse_station_xml(spark, xml_path))
    # comparison edge: decimals go out as double — Spark decimals arrive
    # in pandas as object(Decimal) and string-sort, which breaks the
    # order-insensitive hash against DuckDB's float64 (SURVEY §7.3
    # decimal-rendering risk). The dimension itself stays DECIMAL.
    return typed.withColumn("latitude", F.col("latitude").cast("double")).withColumn(
        "longitude", F.col("longitude").cast("double")
    )


QUERIES = {"q_xml_stations": q_xml_stations}

ORACLES: dict[str, str] = {
    "q_xml_stations": """
        SELECT s_suppkey::INT AS station_id,
               s_name AS station_name,
               concat('T', s_suppkey) AS terminal_name,
               (s_suppkey % 90)::DECIMAL(8,6)::DOUBLE AS latitude,
               ((s_suppkey * 3) % 180)::DECIMAL(9,6)::DOUBLE AS longitude
        FROM supplier
    """,
}
