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


#: Vector width the OPT-IN unrolled dot-product fast path specializes
#: on (64 = the engine's standard embedding width, TESTDATA.md). The
#: emitted expression guards on ``size()`` and any other width takes
#: the exact fold, so results are identical for every input either way.
#: DELIBERATELY NOT THE DEFAULT (r13 optimization round, measured): on
#: the isolated one-hop broadcast-scoring shape the guarded unroll won
#: 1.4-1.7x over the interpreted fold (80k-640k pairs, interleaved
#: A/B), but enabling it across the real multi-hop plans REGRESSED
#: them — q_dedup_embedding steady 3.5s -> 10.9s, q_ann_ivf_refined
#: 4.6s -> 12.1s, with both plan-build and execution inflating — the
#: 3x-larger expression trees (64 products + the fold fallback, times
#: every norm/cosine site, times the windows/joins that repeat them)
#: swamp the per-row win with analysis + codegen cost. Guide §1.1's
#: first-principles-vs-empirical lesson, kept here as the measured
#: negative result so the next round doesn't re-derive it.
UNROLL_DIM = 64


def _fold_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dot_expr(a: str, b: str, dim: int | None = None) -> str:
    """Left-fold dot product (the IEEE sequence the DuckDB oracles
    mirror). Length-mismatched vectors yield NULL (zip_with pads the
    short side with nulls, which poison the fold) — downstream
    threshold filters then DROP the pair silently, so uniform
    dimensionality is a loudly-pinned fixture precondition
    (tests/test_similarity.py), not something this expression can
    distinguish from dissimilarity.

    When ``dim`` is set (opt-in; see the :data:`UNROLL_DIM` note for
    why no call site currently does), vectors of exactly that width
    take a statically-unrolled sum instead of the interpreted fold.
    The sequence is BIT-IDENTICAL: the fold computes
    ``(((0.0 + a0*b0) + a1*b1) + ...)`` and the unrolled chain is the
    same left-associated addition starting from the same 0.0 literal
    (zero-sign included), and a NULL element poisons both forms to
    NULL. Any other width — including NULL arrays, where size() is
    NULL and the CASE falls through — evaluates the original fold
    expression, so semantics are unchanged for every input.
    ``a``/``b`` must be simple column references (the guard evaluates
    them more than once)."""
    fold = _fold_expr(a, b)
    if not dim:
        return fold
    terms = " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))
    return (
        f"(CASE WHEN size({a}) = {dim} AND size({b}) = {dim} "
        f"THEN (CAST(0.0 AS DOUBLE) + {terms}) ELSE {fold} END)"
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
