"""A2 rate-correction semantics matrix (mqtt_data_collector.py:99-134):
never-connected -> NULL; short disconnected window -> discarded;
disconnected -> 2*keep_alive subtracted; connected -> now - started."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.functions.rates import (
    corrected_msg_rate,
)

CASES = [
    # (msg_count, started, stopped, now, keep_alive, expected_rate)
    ("never_connected", 100, None, None, 70.0, 20.0, None),
    # disconnected at 20s < min(25, 200) -> discarded
    ("too_short_window", 100, 0.0, 20.0, 70.0, 20.0, None),
    # boundary: exactly 25 s is NOT discarded (reference uses <)
    ("boundary_25s_kept", 100, 0.0, 25.0, 70.0, 20.0, 100 / (25.0 - 40.0)),
    # disconnected at 60s: elapsed 60 - 2*20 = 20 -> rate 5.0
    ("disconnect_corrected", 100, 0.0, 60.0, 70.0, 20.0, 5.0),
    # still connected: now - started = 50 -> rate 2.0
    ("connected", 100, 0.0, None, 50.0, 20.0, 2.0),
    # small keep-alive: min(25, 10*2)=20 -> 21 s window is kept
    ("small_keepalive_kept", 42, 0.0, 21.0, 70.0, 2.0, 42 / (21.0 - 4.0)),
    ("small_keepalive_short", 42, 0.0, 19.0, 70.0, 2.0, None),
]


@pytest.mark.parametrize(
    ("label", "count", "started", "stopped", "now", "ka", "expected"),
    CASES,
    ids=[c[0] for c in CASES],
)
def test_corrected_rate(spark, label, count, started, stopped, now, ka, expected):
    df = spark.createDataFrame(
        [(count, started, stopped, now)],
        "msg_count long, started double, stopped double, now double",
    )
    got = df.select(
        corrected_msg_rate(
            F.col("msg_count"), F.col("started"), F.col("stopped"),
            F.col("now"), keep_alive_secs=ka,
        ).alias("rate")
    ).collect()[0]["rate"]
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)
