"""Bucketed co-located joins (100 TB posture): the shuffle is paid once at
write time; every later join on the bucket key runs with NO Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.bucketing import (
    bucketed_join_ready,
    scan_has_no_shuffle_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    # remove orphaned managed-table locations from interrupted runs: the
    # in-memory catalog forgets them but saveAsTable refuses the path
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=4)
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=4)
    yield "b_lineitem", "b_orders"
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    li, orders = bucketed_join_ready(spark, left, right)
    # disable auto-broadcast: at the 100 TB design point neither fact
    # side fits a broadcast, which is exactly when bucketing matters
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert scan_has_no_shuffle_join(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_same_join_does_shuffle(spark, sf_dir):
    # control: the identical join over plain parquet scans pays the
    # hash-partitioning exchange the bucketed path elides
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_unbucketed(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    li, orders = bucketed_join_ready(spark, left, right)
    got = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .collect()[0]
    )
    pli = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    po = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = (
        pli.join(po, pli.l_orderkey == po.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .collect()[0]
    )
    assert (got["n"], got["total"]) == (want["n"], want["total"])


def test_bucketed_groupby_on_key_has_no_exchange(spark, bucketed_tables):
    # bucketing also pre-partitions aggregation on the bucket key
    left, _ = bucketed_tables
    li = spark.table(left)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
