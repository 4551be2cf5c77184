"""SparkSession factory.

One place to pin the session config the whole engine assumes:
UTC session timezone (the reference emits ISO-8601 UTC wall-clock times,
src/mqtt_data_collector.py:229), AQE for runtime re-planning, Arrow for
any pandas-UDF path.  Shuffle partitions default to the local core count
— on a real cluster this is overridden to ~2-3× total cores (see README).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "transitdata-monitor-data-collector-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode defaults come from ``SPARK_GRAFT_CPUS`` (driver contract);
    on a cluster, pass ``master=None`` with external submit config and the
    builder leaves master/resources to spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def read_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read driver-generated parquet tables (TESTDATA.md) as DataFrames."""
    return tuple(spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names)
