"""Oracle-engine semantics canary (round-5 VERDICT items 1 & 5).

The DuckDB oracles are compared hash-exactly against Spark, so every
engine-level semantic the oracle SQL leans on is a correctness
dependency. CORRECTNESS_r05 proved this the hard way: DuckDB changed
integer ``//`` from truncate-toward-zero (1.0.0: ``-7 // 2 = -3``) to
floor (newer: ``-4``) between the local mirror's build and the
driver's, and the only two oracles routing NEGATIVE values through
``//`` (doc_quality_logreg / doc_quality_calibration) went hash-red on
the driver while staying green locally.

This module pins, in one place, every cross-engine invariant the
oracles rely on, so a driver-side DuckDB bump shows up as a NAMED local
failure instead of a gate surprise:

- ``_tdiv_sql`` (sign-explicit truncating division) == Spark ``DIV``
  for all sign combinations of the numerator — by construction it is
  version-independent (the inner ``//`` only ever sees non-negative
  numerators, where floor == truncate).
- raw ``//`` agreement with Spark ``DIV`` is asserted ONLY for
  non-negative numerators — the regime every remaining raw-``//``
  oracle site is in (audited r6: counts, hashes, epoch diffs against
  minima, cumulative sums over non-negative terms).
- ``%`` sign-follows-dividend on both engines.
- string-split-of-empty-string yields one element on both engines
  (doc_sequence_packing's ``n_tokens >= 1`` / ``cum >= 1`` guarantee,
  which keeps its window math out of negative territory).
- the md5-prefix 60-bit bucket idiom is non-negative and identical on
  both engines (the dedup/shard/sampling families all hash this way).

The probe that records which ``//`` build is present is informational:
both semantics are acceptable NOW precisely because no oracle feeds
``//`` a negative anymore.
"""

from __future__ import annotations

import duckdb
import pytest

from transitdata_monitor_data_collector_spark.plans.llm_data import _tdiv_sql

# numerators cover both signs, zero, exact multiples, and |a| < b;
# divisors are positive (the only regime _tdiv_sql supports and the
# only one any oracle uses).
CASES = [
    (a, b)
    for a in (-4001, -4000, -3999, -7, -1, 0, 1, 7, 3999, 4000, 4001,
              -123456789, 123456789)
    for b in (1, 2, 4, 1000, 4000)
]


def _py_trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


def test_tdiv_sql_is_truncating_division_in_duckdb(ddb):
    """_tdiv_sql == truncate-toward-zero under ANY DuckDB // semantics."""
    exprs = ", ".join(_tdiv_sql(str(a), str(b)) for a, b in CASES)
    got = ddb.execute(f"SELECT {exprs}").fetchone()
    want = tuple(_py_trunc_div(a, b) for a, b in CASES)
    assert got == want


def test_spark_div_is_truncating_division(spark):
    exprs = ", ".join(
        f"CAST({a} AS BIGINT) DIV CAST({b} AS BIGINT)" for a, b in CASES
    )
    got = tuple(spark.sql(f"SELECT {exprs}").collect()[0])
    want = tuple(_py_trunc_div(a, b) for a, b in CASES)
    assert got == want


def test_raw_floordiv_matches_spark_div_on_nonnegative(ddb):
    """The regime every remaining raw-// oracle site is in: floor ==
    truncate when the numerator is non-negative, on every DuckDB."""
    nn = [(a, b) for a, b in CASES if a >= 0]
    exprs = ", ".join(f"({a}) // ({b})" for a, b in nn)
    got = ddb.execute(f"SELECT {exprs}").fetchone()
    assert got == tuple(a // b for a, b in nn)


def test_duckdb_floordiv_semantics_probe(ddb):
    """Record which // build this is. Both answers are acceptable since
    r6 (no oracle feeds // a negative); anything ELSE means a third
    semantics appeared and the audit must be redone."""
    probe = ddb.execute("SELECT -7 // 2").fetchone()[0]
    assert probe in (-3, -4), (
        f"DuckDB {duckdb.__version__}: -7 // 2 = {probe} — neither "
        "truncation (-3) nor floor (-4); re-audit every // oracle site"
    )


def test_modulo_sign_follows_dividend_both_engines(ddb, spark):
    pairs = [(-7, 2), (7, 2), (-7, 4000), (7, 4000), (0, 5)]
    d = ddb.execute(
        "SELECT " + ", ".join(f"({a}) % ({b})" for a, b in pairs)
    ).fetchone()
    s = tuple(
        spark.sql(
            "SELECT "
            + ", ".join(
                f"CAST({a} AS BIGINT) % CAST({b} AS BIGINT)"
                for a, b in pairs
            )
        ).collect()[0]
    )
    want = tuple(_py_trunc_div(a, b) * -b + a for a, b in pairs)  # a - trunc(a/b)*b
    assert tuple(d) == want
    assert s == want


def test_empty_string_split_has_one_element_both_engines(ddb, spark):
    """doc_sequence_packing's n_tokens >= 1 guarantee (keeps its
    cumulative-sum window math non-negative on both engines)."""
    d = ddb.execute(
        "SELECT len(string_split('', ' ')), "
        "len(str_split_regex(trim(''), '\\s+')), "
        "len(str_split_regex(trim('  '), '\\s+'))"
    ).fetchone()
    assert d == (1, 1, 1)
    s = spark.sql(
        r"SELECT size(split('', ' ')), size(split(trim(''), '\\s+')), "
        r"size(split(trim('  '), '\\s+'))"
    ).collect()[0]
    assert tuple(s) == (1, 1, 1)


def test_hugeint_pandas_dtype_is_version_dependent(ddb):
    """Why every oracle must CAST aggregate outputs to BIGINT (r7 root
    cause for the r5/r6 doc_quality_logreg/_calibration hash-reds):
    DuckDB ``sum(BIGINT)`` returns HUGEINT, and HUGEINT's pandas dtype
    is a VERSION CHOICE — 1.0.0 renders float64, newer builds differ —
    so an uncast sum hashes differently on the driver than locally even
    when the value is identical. fetchall() hides this (exact Python
    ints); the driver's .df() path does not. The dtype-strict parity
    test (test_oracle_parity.test_oracle_dtype_strict) enforces the
    cast registry-wide; this canary documents the mechanism."""
    assert ddb.execute(
        "SELECT typeof(sum(x)) FROM (SELECT CAST(1 AS BIGINT) AS x)"
    ).fetchone()[0] == "HUGEINT"
    pdf = ddb.execute(
        "SELECT sum(x) AS uncast, CAST(sum(x) AS BIGINT) AS cast_ "
        "FROM (SELECT CAST(5 AS BIGINT) AS x UNION ALL SELECT 7)"
    ).df()
    # the CAST column is version-independently integer-kind…
    assert pdf["cast_"].dtype.kind in ("i", "u")
    # …while the uncast one is whatever this build chose (float64 on
    # 1.0.0, object/int elsewhere) — assert only that the local build
    # behaves as documented so a silent conversion change is visible.
    if duckdb.__version__.startswith("1.0."):
        assert pdf["uncast"].dtype.kind == "f"


def test_to_timestamp_is_tz_aware_make_timestamp_is_naive(ddb):
    """Why oracles build timestamps with make_timestamp(micros), never
    to_timestamp(secs): to_timestamp returns TIMESTAMP WITH TIME ZONE,
    which the driver's pandas canonicalizer types tz-aware and
    schema-rejects against Spark's naive TIMESTAMP (the r6 gate's only
    schema-red, promql_alert_for_duration). make_timestamp is plain
    TIMESTAMP — the idiom the hash-green timeseries_m4_downsample
    oracle uses."""
    import pandas as pd

    tz, naive = ddb.execute(
        "SELECT typeof(to_timestamp(3600)), "
        "typeof(make_timestamp(CAST(3600 AS BIGINT) * 1000000))"
    ).fetchone()
    assert tz == "TIMESTAMP WITH TIME ZONE"
    assert naive == "TIMESTAMP"
    pdf = ddb.execute(
        "SELECT to_timestamp(3600) AS tz, "
        "make_timestamp(CAST(3600 AS BIGINT) * 1000000) AS naive"
    ).df()
    assert isinstance(pdf["tz"].dtype, pd.DatetimeTZDtype)
    assert pdf["naive"].dtype.kind == "M"
    assert not isinstance(pdf["naive"].dtype, pd.DatetimeTZDtype)


def test_feature_cte_constructs_are_cross_engine(ddb, spark):
    """The r7 logreg feature CTE rewrite leans only on constructs the
    driver gate has proven: unnest+count(*)/count(DISTINCT) must equal
    Spark's size(split)/size(array_distinct(split)) token counts, and
    CASE-capping must equal least(column, literal), including on
    repeated-space and single-token inputs."""
    texts = ["a b b c", "x", "a  b", "a a a a"]
    for t in texts:
        d_ntok, d_ndist = ddb.execute(
            f"""SELECT count(*), count(DISTINCT tok) FROM
                (SELECT unnest(string_split('{t}', ' ')) AS tok)"""
        ).fetchone()
        s = spark.sql(
            f"SELECT size(split('{t}', ' ')), "
            f"size(array_distinct(split('{t}', ' ')))"
        ).collect()[0]
        assert (d_ntok, d_ndist) == tuple(s), t
    # CASE cap == least(col, 1000) over both regimes
    d = ddb.execute(
        "SELECT CASE WHEN v < 1000 THEN v ELSE 1000 END, least(v, 1000) "
        "FROM (SELECT 47 AS v UNION ALL SELECT 1000 UNION ALL SELECT 1477)"
    ).fetchall()
    assert all(a == b for a, b in d)


def test_oracle_engine_version_recorded(ddb, capsys):
    """VERDICT r6 item 6: surface the oracle engine version in the test
    log so correctness stories can name which DuckDB the mirror ran —
    the r5->r6 failure proved the driver's build differs from 1.0.0."""
    v = duckdb.__version__
    print(f"[oracle-engine] local duckdb={v}")
    assert v  # always true; the value lands in the captured log


def test_md5_bucket_idiom_nonnegative_and_identical(ddb, spark):
    """60-bit md5-prefix bucket: DuckDB ('0x'||substr(md5(x),1,15))::BIGINT
    == Spark conv(substr(md5(x),1,15),16,10), and >= 0 (so raw // and %
    on it are version-safe)."""
    vals = ["", "a", "42", "doc-123", "äö"]
    d = ddb.execute(
        "SELECT "
        + ", ".join(
            f"('0x' || substr(md5('{v}'), 1, 15))::BIGINT" for v in vals
        )
    ).fetchone()
    s = tuple(
        spark.sql(
            "SELECT "
            + ", ".join(
                f"CAST(conv(substr(md5('{v}'), 1, 15), 16, 10) AS BIGINT)"
                for v in vals
            )
        ).collect()[0]
    )
    assert tuple(d) == s
    assert all(x >= 0 for x in d)
