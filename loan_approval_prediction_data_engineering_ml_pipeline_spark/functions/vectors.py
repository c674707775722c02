"""Vector expressions over ``array<float>`` embedding columns — built from
``zip_with`` / ``aggregate`` so dot products and norms run inside codegen
(no UDF, no VectorUDT conversion).

Arrays are cast to double before arithmetic: accumulation order is the
array's element order on both Spark and DuckDB, so results are bit-stable
across engines (modulo the final rounding the query applies).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
