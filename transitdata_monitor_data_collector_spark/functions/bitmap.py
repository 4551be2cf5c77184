"""Shared bitmap word-slot arithmetic for exact-distinct bitmaps.

Every bitmap consumer (batch ``agg_bitmap_distinct_users`` /
``events_wau_bitmap_exact``, streaming ``bitmap_distinct_job``, the IVM
partial state ``ivm_bitmap_state``) places id ``x`` into word
``floor(x / 32)`` bit ``x mod 32``. Getting that arithmetic wrong is a
silent-corruption class of bug, so it lives in ONE place:

- ``F.shiftright(x, 5)`` is exact floor-division by 32 over the FULL
  long domain. The naive ``(x / 32).cast("long")`` goes through double —
  |x| >= 2^53 rounds to the wrong word — and truncates toward zero, so
  ``-1`` and ``+0`` collide in word 0. ``F.floor(x / 32)`` has the same
  double rounding hazard.
- ``pmod(x, 32)`` keeps the bit index in [0, 32) for negative ids
  (plain ``%`` follows the dividend's sign and would feed a negative
  shift count into ``shiftleft``, which Java masks mod 64 — a wrong,
  not-even-erroring bit).

The DuckDB oracle twin uses ``x >> 5`` (arithmetic shift = floor
division there too; DuckDB's ``//`` truncates toward zero) and
``((x % 32) + 32) % 32`` so both engines compute the identical
function over the full id domain, not just the non-negative fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["bitmap_word", "bitmap_bit", "ORACLE_WORD_SQL", "ORACLE_BIT_SQL"]

# DuckDB-side fragments, parameterized on the id expression.
ORACLE_WORD_SQL = "({id} >> 5)"
ORACLE_BIT_SQL = "(1::BIGINT << CAST((({id} % 32) + 32) % 32 AS INTEGER))"


def bitmap_word(id_col: str | Column) -> Column:
    """Word index: exact floor(id / 32) over the full long domain."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.shiftright(c.cast("long"), 5)


def bitmap_bit(id_col: str | Column) -> Column:
    """Single-bit mask ``1 << (id mod 32)`` with a non-negative shift.

    ``F.call_function`` because the PySpark ``F.shiftleft`` wrapper only
    accepts a Python int for numBits; the underlying SQL function takes
    a column fine."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.pmod(c.cast("long"), F.lit(32)).cast("int"),
    )
