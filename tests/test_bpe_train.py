"""Pin the BPE merge-application fold to canonical single-pass
left-to-right non-overlapping semantics (Sennrich et al. 2016), on BOTH
engines — the subtle cases are odd runs of the same symbol and
alternating patterns, where naive string replace() diverges (it skips
matches whose delimiter space was consumed by the previous match)."""

from __future__ import annotations

import duckdb
import pytest

from transitdata_monitor_data_collector_spark.plans.llm_data import (
    _bpe_apply_merge,
)

CASES = [
    # (symbols-in, (a, b), expected-out)
    ("a b", ("a", "b"), "ab"),
    ("a b a b a b", ("a", "b"), "ab ab ab"),
    ("a a a", ("a", "a"), "aa a"),  # odd run: trailing singleton stays
    ("a a a a", ("a", "a"), "aa aa"),
    ("a a a a a", ("a", "a"), "aa aa a"),
    ("b a b a", ("b", "a"), "ba ba"),
    ("a b b", ("a", "b"), "ab b"),  # merged tail never re-triggers
    ("a a b", ("a", "b"), "a ab"),
    ("x y z", ("a", "b"), "x y z"),  # pair absent: unchanged
    ("ab b", ("ab", "b"), "abb"),  # multi-char left symbol
    ("m er ge", ("m", "er"), "mer ge"),
    ("q", ("q", "q"), "q"),  # single symbol: no pairs
]


@pytest.mark.parametrize("sym_in,pair,expected", CASES)
def test_spark_fold_is_ltr(spark, sym_in, pair, expected):
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(sym_in).alias("sym_str"))
    got = df.select(
        _bpe_apply_merge(F.col("sym_str"), pair[0], pair[1]).alias("out")
    ).collect()[0]["out"]
    assert got == expected


@pytest.mark.parametrize("sym_in,pair,expected", CASES)
def test_duckdb_fold_matches_spark(sym_in, pair, expected):
    con = duckdb.connect()
    got = con.execute(
        """
        SELECT list_reduce(str_split(?, ' '),
          (acc, s) -> CASE WHEN (acc = ba OR ends_with(acc, ' ' || ba))
                            AND s = bb
                      THEN acc || bb ELSE acc || ' ' || s END)
        FROM (SELECT ? AS ba, ? AS bb)
        """,
        [sym_in, pair[0], pair[1]],
    ).fetchone()[0]
    assert got == expected


def test_replace_based_merge_would_be_wrong():
    """The documented counterexample: on an odd alternating run, string
    replace() merges symbols (1,2) and (4,5) — single-pass LTR merges
    (1,2) and (3,4). Guards against 'simplifying' the fold to replace."""
    s = " a a a a a "
    assert s.replace(" a a ", " aa ") == " aa a aa "  # NOT the LTR answer
