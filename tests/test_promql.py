"""PromQL-equivalent counter math: reset guard, increase, rate, and the
store-backed panel path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.functions.promql import (
    increase_windowed,
    rate_over_store,
    rate_windowed,
)


def _samples(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = []
    # series "a": monotonic 0,10,25,45 at 0/20/40/60s -> increase 45
    for i, v in enumerate([0.0, 10.0, 25.0, 45.0]):
        rows.append(("a", t0 + dt.timedelta(seconds=20 * i), v))
    # series "b": 100,110, RESET to 5, 20 -> increase 10 + 5 + 15 = 30
    for i, v in enumerate([100.0, 110.0, 5.0, 20.0]):
        rows.append(("b", t0 + dt.timedelta(seconds=20 * i), v))
    return spark.createDataFrame(rows, "series string, ts timestamp, counter double")


def test_increase_reset_guard(spark):
    inc = increase_windowed(_samples(spark), ["series"], "2 minutes")
    got = {r["series"]: r["increase"] for r in inc.collect()}
    assert got == {"a": 45.0, "b": 30.0}


def test_rate_is_increase_over_seconds(spark):
    rate = rate_windowed(_samples(spark), ["series"], "2 minutes")
    got = {r["series"]: r["rate_per_s"] for r in rate.collect()}
    assert got["a"] == round(45.0 / 120.0, 8)
    assert got["b"] == round(30.0 / 120.0, 8)


def test_rate_over_store_prunes_and_matches(spark, tmp_path):
    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        write_time_partitioned,
    )

    path = str(tmp_path / "store")
    # two days of samples; only day one inside the queried range
    day1 = _samples(spark)
    day2 = day1.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY")).withColumn(
        "counter", F.col("counter") + 1000.0
    )
    write_time_partitioned(
        day1.unionByName(day2), path, ts_col="ts", mode="overwrite"
    )
    out = rate_over_store(
        spark, path, ["series"], "2 minutes",
        date_from="2024-05-01", date_to="2024-05-01",
    )
    rows = out.collect()
    assert {r["series"] for r in rows} == {"a", "b"}
    assert all(r["window_start"].day == 1 for r in rows)
    got = {r["series"]: r["rate_per_s"] for r in rows}
    assert got["a"] == round(45.0 / 120.0, 8)


def test_increase_matches_python_model_on_random_series(spark):
    """Property-style check: reset-guarded increase over random counter
    series equals the pure-Python model. All series ride in ONE DataFrame
    (one Spark job, not one per example)."""
    import random

    rng = random.Random(42)
    t0 = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows, expected = [], {}
    for s in range(50):
        name = f"s{s:02d}"
        n = rng.randint(1, 20)
        vals = []
        v = rng.uniform(0, 100)
        for _ in range(n):
            if rng.random() < 0.15:
                v = rng.uniform(0, 5)  # counter reset
            else:
                v += rng.uniform(0, 10)
            vals.append(round(v, 6))
        for i, val in enumerate(vals):
            rows.append((name, t0 + dt.timedelta(seconds=10 * i), val))
        # python model: sum of guarded deltas, first sample contributes 0
        inc, prev = 0.0, None
        for val in vals:
            if prev is not None:
                inc += val if val < prev else val - prev
            prev = val
        expected[name] = round(inc, 6)
    df = spark.createDataFrame(rows, "series string, ts timestamp, counter double")
    got = {
        r["series"]: r["increase"]
        for r in increase_windowed(df, ["series"], "1 hour").collect()
    }
    assert got.keys() == expected.keys()
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-6, k
