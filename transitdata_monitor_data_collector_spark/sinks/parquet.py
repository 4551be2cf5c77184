"""Partitioned parquet sink — the at-rest layout for the 100 TB store.

The reference keeps no history at all (every metric point is POSTed and
forgotten, src/mqtt_data_collector.py:236-253); an analytics engine needs
the opposite: an append-only columnar store the batch/PromQL query layer
can scan with partition pruning. The layout decisions here are the ones
that matter at scale:

- **Hive-style date partitioning** (``dt=YYYY-MM-DD[/hour=HH]``): every
  dashboard-range query carries a time predicate, so pruning removes
  whole directories before any IO. Cardinality stays bounded (365 dirs a
  year x 24) — never partition by high-cardinality keys like topic.
- **In-partition sort by the hot group keys** (broker, topic_filter):
  parquet row-group min/max stats then let scans skip row groups for
  selective key predicates — a poor man's z-order adequate for a
  two-level key.
- **Capped files per partition** via a pre-write repartition on the
  partition columns (+ key salt): avoids the many-small-files problem a
  32-reducer shuffle would otherwise create per daily partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_time_partitioned", "read_pruned"]


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_cols: Sequence[str] = (),
    hourly: bool = False,
    files_per_partition: int = 1,
    mode: str = "append",
) -> None:
    """Write ``df`` partitioned by derived ``dt`` (and optionally ``hour``)
    columns, sorted within partitions by ``sort_cols``."""
    parts = ["dt"]
    out = df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    if hourly:
        out = out.withColumn("hour", F.date_format(F.col(ts_col), "HH"))
        parts.append("hour")
    # one shuffle keyed on the partition cols (+ salt when >1 file is
    # wanted): each task writes to exactly one hive partition, producing
    # files_per_partition files there instead of one-per-reducer
    salt = (F.crc32(F.concat_ws("|", *sort_cols)) % files_per_partition
            if sort_cols else F.lit(0))
    out = out.repartition(*[F.col(c) for c in parts], salt.alias("__salt"))
    if sort_cols:
        out = out.sortWithinPartitions(*parts, *sort_cols)
    out.write.mode(mode).partitionBy(*parts).parquet(path)


def read_pruned(
    spark: SparkSession,
    path: str,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """Scan the partitioned store with the date predicate expressed on the
    PARTITION column, so it prunes directories (shows up as
    PartitionFilters in the scan node, not a post-scan Filter)."""
    df = spark.read.parquet(path)
    if date_from is not None:
        df = df.filter(F.col("dt") >= date_from)
    if date_to is not None:
        df = df.filter(F.col("dt") <= date_to)
    return df
