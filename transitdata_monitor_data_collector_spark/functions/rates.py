"""Measurement-window rate correction (A2).

Exact semantics of the reference's ``Topic.get_msg_count``
(``src/mqtt_data_collector.py:99-134``):

- never-connected (no measurement start) → NULL;
- disconnected during the window: elapsed = stopped - started;
  - windows shorter than ``min(25, 10 * keep_alive)`` seconds are
    DISCARDED (NULL) — too short for an accurate rate (:110-112);
  - otherwise subtract ``2 * keep_alive`` from elapsed — the time it took
    to detect the dead connection (:113-119; deliberately inflates the
    rate rather than under-reporting, which would fire false alerts);
- still connected: elapsed = now - started;
- rate = msg_count / adjusted elapsed.

Pure Column expressions — the correction runs inside codegen next to the
windowed aggregation, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["corrected_elapsed", "corrected_msg_rate", "MIN_VALID_WINDOW_RULE"]

MIN_VALID_WINDOW_RULE = "min(25, 10 * keep_alive_secs)"


def corrected_elapsed(
    started_at: Column,
    stopped_at: Column,
    now: Column,
    keep_alive_secs: float = 20.0,
) -> Column:
    """Adjusted elapsed seconds, NULL when the window must be discarded."""
    min_valid = F.least(F.lit(25.0), F.lit(10.0 * keep_alive_secs))
    raw = stopped_at - started_at
    return (
        F.when(started_at.isNull(), F.lit(None).cast("double"))
        .when(stopped_at.isNotNull() & (raw < min_valid), F.lit(None))
        .when(stopped_at.isNotNull(), raw - F.lit(2.0 * keep_alive_secs))
        .otherwise(now - started_at)
    )


def corrected_msg_rate(
    msg_count: Column,
    started_at: Column,
    stopped_at: Column,
    now: Column,
    keep_alive_secs: float = 20.0,
) -> Column:
    """msg/s with the disconnect correction; NULL propagates from
    discarded/never-measured windows (the sink's NULL filter then drops
    them — mqtt_data_collector.py:199-205)."""
    elapsed = corrected_elapsed(started_at, stopped_at, now, keep_alive_secs)
    return msg_count.cast("double") / elapsed
