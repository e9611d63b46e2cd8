"""Vector math over array<float/double> columns — JVM-side higher-order
functions (zip_with / aggregate), no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float32 inputs must not multiply in float32
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine(a, b) with caller-precomputed norms — bit-identical to
    :func:`cosine` (same dot fold, same ``na * nb`` product order), but a
    pair join can fold each row's norm ONCE instead of once per partner:
    3 array folds per pair drop to 1. Pass ``na = norm(a)`` computed on
    the pre-join side."""
    return dot(a, b) / (na * nb)
