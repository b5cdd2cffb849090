"""XLSX ingest edge (SURVEY.md §2.1 S7).

The reference normalizes stray Excel weekly files to CSV with pandas
(``airflow/dags/ingest_bike_data.py:136-144``) before the schema'd read.
Same shape here: pandas at the ingest edge, Spark from the first
DataFrame on. The Excel engine (openpyxl) is not a guaranteed
dependency, so the reader is import-gated; the conversion logic itself
is exercised in tests via the pandas round-trip seam.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def xlsx_support() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """XLSX → pandas → Spark DataFrame (all columns as string, matching
    the CSV path's read-then-cast discipline)."""
    if not xlsx_support():
        raise NotImplementedError(
            "XLSX ingest requires openpyxl, which is not installed in this "
            "environment; convert to CSV upstream or install openpyxl."
        )
    pdf = pd.read_excel(path, dtype=str)
    return from_pandas_strings(spark, pdf)


def from_pandas_strings(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """The Spark-side seam shared by the XLSX and any other
    pandas-at-the-edge reader: everything string, NULLs preserved."""
    pdf = pdf.astype("string").where(pdf.notna(), None)
    return spark.createDataFrame(pdf.astype(object))
