"""Vector math as pure column expressions (no UDFs).

Embeddings arrive as ARRAY<FLOAT>. All math is done in double precision via
higher-order functions (zip_with / aggregate), which run inside the JVM —
no Python, no Arrow transfer, fully codegen-compatible. Summation is a
sequential left fold in array order, which makes results reproducible and
lets a DuckDB oracle match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    """ARRAY<FLOAT> -> ARRAY<DOUBLE> (each float widened exactly)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision, summed left-to-right."""
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-null."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance in double precision."""
    diffs = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x - y)
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x * x))
