"""Vector column math over ``array<float>`` embeddings (north-star).

Pure higher-order-function expressions (`F.zip_with`/`F.aggregate`)
— JVM-side, no UDF, no driver collect. These are the building blocks
for similarity search and embedding-based dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize an embedding (zero vector passes through)."""
    n = l2_norm(a)
    return F.when(n == 0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x / n)
    )


def _sum_terms(terms: list[str]) -> str:
    return " + ".join(terms)


def norm_expr(a: str, dim: int) -> Column:
    """L2 norm of a NAMED array column with a KNOWN dim, flat codegen
    form. Hoist this into a per-ROW projection before pair scoring so
    each vector's norm is computed once, not once per candidate pair."""
    sq = _sum_terms(
        [
            f"cast(element_at({a}, {i}) as double) * cast(element_at({a}, {i}) as double)"
            for i in range(1, dim + 1)
        ]
    )
    return F.expr(f"sqrt({sq})")


def cosine_from_parts(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a pair dot product and two PRE-COMPUTED norms.

    Same expression tree as :func:`cosine` evaluated lazily — double
    ops in the identical order, so results are bit-equal — but the
    norms come from upstream per-row projections: pair-verify work
    drops from three dim-length folds to one.
    """
    denom = norm_a * norm_b
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot / denom)


def dot_expr(a: str, b: str, dim: int) -> Column:
    """Dot product of two NAMED array columns with a KNOWN dim, as one
    flat codegen expression.

    The higher-order-function form (:func:`dot`) evaluates its lambdas
    interpreted, per element, outside whole-stage codegen — measured
    ~5-8x slower on the pair-verify hot paths at sf0.1. Elements are
    cast to double BEFORE the product (the HOF callers cast the whole
    array first), and the sum is left-associated, so results are
    bit-equal to the fold.
    """
    return F.expr(
        _sum_terms(
            [
                f"cast(element_at({a}, {i}) as double) * cast(element_at({b}, {i}) as double)"
                for i in range(1, dim + 1)
            ]
        )
    )


