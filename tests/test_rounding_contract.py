"""Cross-engine rounding contract: floor(x*scale + 0.5) on identical
doubles must agree between Spark and DuckDB — including the .5-boundary
neighborhoods where the engines' round() builtins disagree (Spark rounds
the exact decimal expansion via BigDecimal HALF_UP; DuckDB rounds a
scaled double). This is the primitive every determinism-hardened query
relies on (SURVEY §9)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _adversarial_values():
    vals = []
    # exact .5-boundary neighborhoods at the micro scale, both signs of ulp
    for k in (0, 1, 3, 123456, 999999):
        base = (k + 0.5) / 1e6
        for eps in (-5e-13, -1e-16, 0.0, 1e-16, 5e-13):
            vals.append(base + eps)
    # float32-derived doubles (the embeddings case)
    import numpy as np

    rng = np.random.RandomState(7)
    vals.extend(float(np.float32(x)) for x in rng.randn(200) * 0.1)
    # ratios that terminate at exactly 4-5 decimals (the q2 unit-cost case)
    vals.extend([147.70125, 1.23455, 0.000015, 2.5e-06])
    return vals


@pytest.mark.parametrize("scale", [1e4, 1e6, 1e12])
def test_floor_micro_agrees_across_engines(spark, scale):
    vals = _adversarial_values()
    sdf = spark.createDataFrame([(v,) for v in vals], "x double").select(
        (F.floor(F.col("x") * scale + 0.5)).alias("fm")
    )
    got = [r["fm"] for r in sdf.collect()]
    con = duckdb.connect()
    exp = [
        con.execute(
            f"SELECT CAST(floor(CAST(? AS DOUBLE) * {scale} + 0.5) AS BIGINT)",
            [v],
        ).fetchone()[0]
        for v in vals
    ]
    assert got == exp


def test_engine_round_builtins_do_disagree(spark):
    """Documents WHY floor-micro exists: the engines' round() builtins
    genuinely disagree on real-world doubles. 147.70125 stores as
    147.7012499...; Spark's round goes through Double.toString's
    SHORTEST decimal representation ("147.70125" -> HALF_UP -> 147.7013)
    while DuckDB rounds the scaled double (1477012.4999... -> 147.7012).
    This exact value produced a live oracle mismatch in
    q2_min_cost_supplier before the floor-micro fix."""
    v = 147.70125
    got = (
        spark.createDataFrame([(v,)], "x double")
        .select(F.round(F.col("x"), 4).alias("r"))
        .collect()[0]["r"]
    )
    exp = duckdb.connect().execute(
        "SELECT round(CAST(? AS DOUBLE), 4)", [v]
    ).fetchone()[0]
    assert got == 147.7013 and exp == 147.7012  # the documented divergence
    # ...and floor-micro agrees on the very same double:
    got_fm = (
        spark.createDataFrame([(v,)], "x double")
        .select(F.floor(F.col("x") * 1e4 + 0.5).alias("fm"))
        .collect()[0]["fm"]
    )
    exp_fm = duckdb.connect().execute(
        "SELECT CAST(floor(CAST(? AS DOUBLE) * 1e4 + 0.5) AS BIGINT)", [v]
    ).fetchone()[0]
    assert got_fm == exp_fm
