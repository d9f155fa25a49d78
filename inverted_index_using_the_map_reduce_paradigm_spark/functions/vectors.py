"""Vector math over ``array<float>`` columns -- built-in higher-order
functions only (``zip_with`` / ``aggregate``), fully JVM-side.

These run inside codegen; no Python crossing.  For 100 TB the dot
product is O(dim) per row pair and the expressions vectorize per
partition; the alternative Pandas-UDF path exists in
``operators/similarity.py`` for benchmarking comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order => stable floats)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
