"""Local mirror of the driver's t2 gate: run every registry query on Spark
AND its DuckDB oracle on the same parquet tables, compare row counts,
column names, and values (order-insensitive, float-tolerant to 1e-9 after
both sides' declared rounding).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from transitdata_monitor_data_collector_spark.plans import load_all

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

REGISTRY = load_all()


@pytest.fixture(scope="module")
def ddb(oracle_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{oracle_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr, not the float: the driver's hash is bit-exact, so -0.0 vs
        # +0.0 must mismatch here too (Python -0.0 == 0.0 would hide it)
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        # the driver's pandas canonicalizer widens DATE to datetime64
        # (midnight), equating date and timestamp columns — mirror that
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if hasattr(v, "asDict"):  # pyspark Row (struct) — check BEFORE tuple:
        return tuple(sorted((k, _norm(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows, key=repr), cols  # repr-key: None-safe ordering


def _duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = res.fetchall()
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, dict):
                vals.append(tuple(sorted((k, _norm(x)) for k, x in v.items())))
            else:
                vals.append(_norm(v))
        out.append(tuple(vals))
    return sorted(out, key=repr), sorted(names)


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
NO_ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, ddb, oracle_sf_dir):
    q = REGISTRY[name]
    got, got_cols = _spark_rows(q.build(spark, oracle_sf_dir))
    exp, exp_cols = _duck_rows(ddb, q.oracle)
    assert got_cols == exp_cols, f"{name}: column mismatch {got_cols} vs {exp_cols}"
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    mismatches = [
        (i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_rows_only(name, spark, oracle_sf_dir):
    df = REGISTRY[name].build(spark, oracle_sf_dir)
    assert df.count() >= 0


def _pandas_kind_families(spark_type):
    """Allowed numpy dtype *kinds* for a Spark field when the oracle's
    result is fetched through duckdb's pandas conversion (what the
    driver gate does — unlike fetchall(), which returns exact Python
    values and HIDES dtype divergence). 'i' int, 'u' uint, 'f' float,
    'M' naive datetime64, 'b' bool, 'O' object."""
    from pyspark.sql import types as T

    if isinstance(
        spark_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return {"i", "u"}
    if isinstance(spark_type, (T.FloatType, T.DoubleType)):
        return {"f"}
    if isinstance(spark_type, T.DecimalType):
        return {"f", "O", "i", "u"}
    if isinstance(spark_type, T.TimestampType):
        return {"M"}  # naive datetime64 ONLY — TIMESTAMPTZ is 'O'/tz-aware
    if isinstance(spark_type, T.DateType):
        return {"M", "O"}
    if isinstance(spark_type, T.BooleanType):
        return {"b"}
    return {"O", "b", "i", "u", "f", "M"}  # strings/structs/misc


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_dtype_strict(name, ddb, spark, oracle_sf_dir):
    """Schema-strict mirror of the driver gate's pandas canonicalizer.

    The r5/r6 driver hash-reds (doc_quality_logreg/_calibration: uncast
    HUGEINT sums -> version-dependent pandas dtype) and the r6 schema-red
    (promql_alert_for_duration: to_timestamp -> TIMESTAMPTZ -> tz-aware
    dtype) were all invisible to the fetchall()-based value comparison
    above, because Python-native fetch returns exact ints / tz-strippable
    datetimes. This test fetches the oracle result the way the driver
    does — ``con.execute(sql).df()`` — and requires every column's pandas
    dtype kind to be compatible with the Spark schema. In particular:

    * Spark integer column  -> oracle must be integer-kind (an uncast
      HUGEINT arrives as float64 on DuckDB 1.0.0 and FAILS here), unless
      the column genuinely contains NULLs (pandas widens nullable ints
      to float64 — allowed only when NaNs are present).
    * Spark timestamp column -> oracle must be NAIVE datetime64
      (TIMESTAMPTZ arrives tz-aware and FAILS here).
    """
    import numpy as np
    import pandas as pd

    q = REGISTRY[name]
    pdf = ddb.execute(q.oracle).df()
    spark_fields = {
        f.name: f.dataType
        for f in q.build(spark, oracle_sf_dir).schema.fields
    }
    assert sorted(pdf.columns) == sorted(spark_fields), (
        f"{name}: oracle columns {sorted(pdf.columns)} != Spark "
        f"{sorted(spark_fields)}"
    )
    bad = []
    for col in pdf.columns:
        dt = pdf[col].dtype
        if isinstance(dt, pd.DatetimeTZDtype):
            bad.append((col, str(dt), "tz-aware vs Spark naive TIMESTAMP"))
            continue
        kind = dt.kind
        allowed = _pandas_kind_families(spark_fields[col])
        if kind in allowed:
            continue
        if (
            kind == "f"
            and allowed & {"i", "u"}
            and bool(pdf[col].isna().any())
        ):
            continue  # genuine NULLs: pandas must widen to float
        if kind == "O" and not np.issubdtype(dt, np.number):
            # object columns of exact Python ints are how NEWER duckdb
            # renders HUGEINT — equally version-dependent, equally bad
            # for an integer-typed Spark column.
            vals = pdf[col].dropna()
            if len(vals) and allowed & {"i", "u"}:
                bad.append(
                    (col, "object", "HUGEINT-style object ints vs int64")
                )
                continue
        bad.append((col, str(dt), f"kind {kind!r} not in {sorted(allowed)}"))
    assert not bad, (
        f"{name}: oracle pandas dtypes incompatible with Spark schema "
        f"(driver gate would schema- or hash-reject): {bad}"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_no_unhashable_output_columns(name, spark, oracle_sf_dir):
    """The driver's oracle harness canonicalizes via pandas sort_values,
    which crashes on array/map-typed columns (unhashable).  Oracle-gated
    registry queries must emit only scalar / struct columns — serialize
    arrays with array_join before registering.
    """
    from pyspark.sql.types import ArrayType, MapType

    schema = REGISTRY[name].build(spark, oracle_sf_dir).schema
    bad = [
        f.name for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not bad, (
        f"{name}: array/map-typed output columns {bad} would crash the "
        "driver's canonicalizer — serialize them (array_join) instead"
    )
