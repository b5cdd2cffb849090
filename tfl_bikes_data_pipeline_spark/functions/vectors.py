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
    """Left-fold dot product (the IEEE sequence the DuckDB oracles
    mirror). Length-mismatched vectors yield NULL (zip_with pads the
    short side with nulls, which poison the fold) — downstream
    threshold filters then DROP the pair silently, so uniform
    dimensionality is a loudly-pinned fixture precondition
    (tests/test_similarity.py), not something this expression can
    distinguish from dissimilarity."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def cosine_expr(a: str, b: str, decimals: int = 6) -> Column:
    """round-6 cosine. The norm product goes through nullif: a
    zero-norm vector would otherwise produce 0/0 = NaN, which Spark
    sorts ABOVE every double — one zero embedding would become the #1
    neighbor of every query in a DESC top-k. NULL instead sorts last
    under the default ordering, and the zero-norm precondition is
    separately pinned by tests/test_similarity.py."""
    return F.round(
        F.expr(
            f"({dot_expr(a, b)}) / nullif(({norm_expr(a)}) * ({norm_expr(b)}), 0.0)"
        ),
        decimals,
    )


def with_norm(df: DataFrame, vec: str = "v", alias: str = "nrm") -> DataFrame:
    """Precompute the L2 norm once per vector — at scale this avoids
    recomputing it per candidate pair."""
    return df.withColumn(alias, F.expr(norm_expr(vec)))
