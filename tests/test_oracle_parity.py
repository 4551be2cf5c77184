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
