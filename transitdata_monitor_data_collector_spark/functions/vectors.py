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
    """NULL (not an ANSI divide-by-zero crash) when either norm is 0 —
    matching the oracle's NULL-on-zero-division, so zero vectors fall out
    of >= threshold filters instead of killing the job (latent until a
    zero-norm pair reached an LSH verify under ANSI mode)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def pico_dot(a: Column, b: Column) -> Column:
    """Exact inner product via picounit scaled-integer accumulation.

    A plain double fold differs from DuckDB's ``list_dot_product`` by an
    ulp often enough to flip the 6th decimal at sf0.1 — fatal wherever
    the value feeds a rounded tiebreak.  Each product term is scaled to
    picounits and floored to a LONG (identical on both engines from
    identical doubles); the integer sum is exact and order-independent.
    (A DECIMAL fold is NOT type-stable here: Spark widens p+s on add and
    truncates the scale at the precision cap, so the aggregate lambda's
    type drifts from the accumulator's.)  Oracle twin:
    ``operators.similarity.pico_dot_sql``.
    """
    return F.aggregate(
        F.zip_with(
            as_double(a),
            as_double(b),
            lambda x, y: F.floor(x * y * 1e12 + 0.5).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(1e12)


def pico_cosine(a: Column, b: Column) -> Column:
    """Cosine from :func:`pico_dot` parts — cross-engine deterministic
    given identical input doubles (IEEE sqrt/divide are exact-rounded)."""
    return pico_dot(a, b) / (
        F.sqrt(pico_dot(a, a)) * F.sqrt(pico_dot(b, b))
    )


def pico_sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance via the same picounit accumulation as
    :func:`pico_dot` — used wherever a distance feeds an argmin tiebreak
    that must agree with the DuckDB oracle
    (``operators.similarity.pico_sqdist_sql``)."""
    return F.aggregate(
        F.zip_with(
            as_double(a),
            as_double(b),
            lambda x, y: F.floor(F.pow(x - y, 2) * 1e12 + 0.5).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(1e12)
