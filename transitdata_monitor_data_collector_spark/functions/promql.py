"""PromQL-equivalent counter queries as reusable DataFrame transforms.

The reference delegates its entire query layer to Grafana-issued PromQL
over Prometheus counters (grafana/mqtt-dashboard.json:92,183,... —
``rate(mqtt_messages_received_total{...}[$__rate_interval])``). These are
the engine-native equivalents (SURVEY.md §2.4 A7), factored out of the
registry queries so jobs can run them over any counter-sample frame —
including the partitioned history store (``sinks/parquet.read_pruned``).

Counter-reset semantics match PromQL: a sample smaller than its
predecessor means the process restarted and the counter restarted at ~0;
the increase contributed by that step is the new value itself, not the
(negative) difference. The reference relies on this exact behavior — its
collectors keep counters in memory and restart at 0
(SURVEY.md §2.7 T4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["increase_windowed", "rate_windowed", "rate_over_store"]


def _guarded_delta(keys: Sequence[str], ts_col: str, counter_col: str) -> Column:
    prev = F.lag(counter_col).over(W.partitionBy(*keys).orderBy(ts_col))
    delta = F.col(counter_col) - prev
    return (
        F.when(prev.isNull(), F.lit(0.0))  # first sample: no increase yet
        .when(delta < 0, F.col(counter_col))  # reset: counter restarted
        .otherwise(delta)
    )


def increase_windowed(
    samples: DataFrame,
    keys: Sequence[str],
    window_duration: str,
    ts_col: str = "ts",
    counter_col: str = "counter",
) -> DataFrame:
    """PromQL ``increase(counter[window])`` per tumbling window and key set:
    sum of reset-guarded deltas. One window-function pass partitioned by
    the series keys (each series' samples are few — one per scrape — so
    the per-key sort is cheap and uniformly partitioned), then a windowed
    aggregation: shuffle count 2, both on the series keys."""
    per_step = samples.withColumn(
        "__inc", _guarded_delta(keys, ts_col, counter_col)
    )
    return (
        per_step.groupBy(F.window(ts_col, window_duration).alias("w"), *keys)
        .agg(F.sum("__inc").alias("increase"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            F.round("increase", 6).alias("increase"),
        )
    )


def rate_windowed(
    samples: DataFrame,
    keys: Sequence[str],
    window_duration: str,
    ts_col: str = "ts",
    counter_col: str = "counter",
) -> DataFrame:
    """PromQL ``rate()`` = increase / window seconds."""
    secs = _duration_to_seconds(window_duration)
    inc = increase_windowed(samples, keys, window_duration, ts_col, counter_col)
    return inc.withColumn(
        "rate_per_s", F.round(F.col("increase") / F.lit(float(secs)), 8)
    )


def rate_over_store(
    spark: SparkSession,
    store_path: str,
    keys: Sequence[str],
    window_duration: str,
    date_from: str | None = None,
    date_to: str | None = None,
    ts_col: str = "ts",
    counter_col: str = "counter",
) -> DataFrame:
    """The full dashboard-panel path over the at-rest store: pruned scan
    (directory-level dt pruning) -> reset-guarded windowed rate. This is
    the engine's answer to 'Grafana queries Prometheus': same semantics,
    but over the 100 TB parquet history with partition pruning instead of
    a TSDB lookback."""
    from transitdata_monitor_data_collector_spark.sinks.parquet import read_pruned

    samples = read_pruned(spark, store_path, date_from, date_to)
    # The history writer is at-least-once in one narrow crash window
    # (streaming/jobs.py stream_merge_counter_job: re-delivery after a
    # crash between the append's job commit and its marker rename). No
    # dedup pass is needed here: an exact duplicate (key, ts, counter)
    # sample contributes ZERO to the reset-guarded delta — lag sees an
    # equal previous value, so delta = 0, and equal values cannot trip
    # the reset branch — making rate/increase duplicate-immune by
    # construction (asserted in tests/test_streaming_extras.py). An
    # explicit dropDuplicates would add a full (keys, ts) shuffle ahead
    # of the window's (keys) shuffle — measured +1.5 s at sf0.1 — for
    # semantics the delta algebra already provides.
    return rate_windowed(samples, keys, window_duration, ts_col, counter_col)


def _duration_to_seconds(d: str) -> int:
    num, unit = d.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return int(num) * mult
