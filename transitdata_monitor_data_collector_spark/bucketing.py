"""Bucketed (co-located) joins — the shuffle-free path for repeated
fact-fact joins at the 100 TB design point.

The reference never joins two large tables (its joins are allowlist
lookups, SURVEY.md §2.5), but the engine's relational surface does:
``lineitem ⋈ orders`` on the order key is the canonical repeated join,
and at 100 TB each execution pays a full shuffle of both sides unless the
tables are stored pre-partitioned. Spark's answer is bucketing:
``DataFrameWriter.bucketBy(n, key).sortBy(key).saveAsTable(...)`` writes
each table hash-partitioned into the same number of buckets; a join on
the bucket key is then planned as a SortMergeJoin with **no Exchange on
either side** — the shuffle is paid once at write time and amortized over
every subsequent join, aggregation, or dedup keyed on the same column.

These helpers wrap that pattern and pin the invariants that make it work:
both sides bucketed by the SAME key into the SAME bucket count, and
``spark.sql.sources.bucketing.enabled`` left on (default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready", "scan_has_no_shuffle_join"]


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table.

    ``num_buckets`` should be sized so one bucket of the LARGEST table
    sharing this key fits an executor core's working memory (at 100 TB of
    lineitem and ~128 MB-512 MB per task: thousands of buckets). All
    tables that will be co-joined must use the same ``key`` semantics and
    ``num_buckets`` — Spark only elides the shuffle when bucket counts
    match (or divide evenly with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(*(sort_cols or [key]))
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_join_ready(
    spark: SparkSession, left: str, right: str
) -> tuple[DataFrame, DataFrame]:
    """Return the two bucketed tables as DataFrames (metastore-backed, so
    the scan carries the bucketing spec Catalyst needs to skip the
    Exchange)."""
    return spark.table(left), spark.table(right)


def scan_has_no_shuffle_join(joined: DataFrame) -> bool:
    """True iff the executed plan contains a join but NO shuffle exchange —
    the signature of a co-located bucketed join. (AQE keeps the plan
    adaptive; we inspect the final string form.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    has_join = "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    return has_join and "Exchange hashpartitioning" not in plan
