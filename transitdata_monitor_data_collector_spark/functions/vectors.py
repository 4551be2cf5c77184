"""Embedding vector math as pure Column expressions over ``array<float>``.

No UDFs: ``zip_with`` + ``aggregate`` stay JVM-side and fold into
whole-stage codegen. Arrays are cast to ``array<double>`` first so the
accumulation order and precision are well-defined (and match the DuckDB
oracle's ``DOUBLE[]`` math bit-for-bit: both reduce left-to-right).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
