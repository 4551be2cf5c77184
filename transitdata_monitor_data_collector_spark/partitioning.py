"""Partitioning helpers shared across operators.

At the 100 TB design point inputs arrive as thousands of file splits and
these helpers are no-ops; on small/local data they keep CPU-heavy narrow
pipelines from being pinned to a single core by a single-split scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["spread_small_input"]


def spread_small_input(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster has
    slots. A small corpus often arrives as ONE file split, which pins every
    narrow (per-row CPU-heavy) pipeline stage to one core; at real scale
    the scan already has many splits and this is a no-op — no extra
    shuffle of the full data."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        # explicit partition count: AQE would coalesce a small keyed
        # shuffle right back to one partition, undoing the spread
        return df.repartition(sc.defaultParallelism, F.col(key_col))
    return df
