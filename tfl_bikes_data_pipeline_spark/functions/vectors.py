"""Vector math over ``array<float>`` embedding columns — pure Spark SQL
higher-order functions (JVM-side, no Python UDF in the hot path).

Floats are widened to double *before* any arithmetic so results are
bit-identical to the DuckDB oracle's double math; rounding to 6
decimals absorbs nothing but the impossible (error ~1e-12 vs grid 5e-7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_double_vec(col: str = "embedding", alias: str = "v") -> Column:
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))").alias(alias)


def dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def cosine_expr(a: str, b: str, decimals: int = 6) -> Column:
    return F.round(
        F.expr(f"({dot_expr(a, b)}) / (({norm_expr(a)}) * ({norm_expr(b)}))"), decimals
    )


def with_norm(df: DataFrame, vec: str = "v", alias: str = "nrm") -> DataFrame:
    """Precompute the L2 norm once per vector — at scale this avoids
    recomputing it per candidate pair."""
    return df.withColumn(alias, F.expr(norm_expr(vec)))
