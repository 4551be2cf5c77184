"""The engine's cross-engine deterministic rounding contract.

``round()`` builtins genuinely disagree between engines on boundary
doubles: Spark rounds the value's SHORTEST decimal representation via
BigDecimal HALF_UP, DuckDB rounds a scaled double (see
tests/test_rounding_contract.py, which pins the divergence on a live
value, 147.70125). Every oracle-gated query therefore rounds doubles as

    floor(x * 10^d + 0.5) / 10^d

— pure double multiply + floor, bit-identical across engines for
identical input doubles. This module is the ONE home for that idiom;
inline re-derivations drift (a ``* 1e6`` on one side vs ``* 10**6`` on
the other would be invisible until a driver hash mismatch).

``fround`` / ``fround_sql`` return the rounded DOUBLE (the common output
shape); ``fscaled`` / ``fscaled_sql`` return the scaled LONG (for
order-independent integer accumulation, e.g. picounit dot products).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column, decimals: int) -> Column:
    """Deterministic round-half-up of a double to ``decimals`` places."""
    scale = float(10**decimals)
    return F.floor(col.cast("double") * scale + 0.5) / scale


def fround_sql(expr: str, decimals: int) -> str:
    """The oracle-SQL twin of :func:`fround` (ANSI SQL, DuckDB-ready)."""
    scale = f"1e{decimals}"
    return f"floor(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) / {scale}"


def fscaled(col: Column, decimals: int) -> Column:
    """Scaled-integer form: floor(x * 10^d + 0.5) as LONG — sum these for
    order-independent exact accumulation, divide once at the end."""
    scale = float(10**decimals)
    return F.floor(col.cast("double") * scale + 0.5).cast("long")


def fscaled_sql(expr: str, decimals: int) -> str:
    """The oracle-SQL twin of :func:`fscaled`."""
    scale = f"1e{decimals}"
    return f"CAST(floor(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) AS BIGINT)"
