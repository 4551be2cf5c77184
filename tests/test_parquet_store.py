"""Partitioned parquet store: pruning and layout guarantees."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.plans import table
from transitdata_monitor_data_collector_spark.sinks.parquet import (
    read_pruned,
    write_time_partitioned,
)


def _write_events(spark, sf_dir, path, **kw):
    ev = table(spark, sf_dir, "events")  # handles TIMESTAMP(NANOS) inputs
    write_time_partitioned(
        ev, path, ts_col="ts", sort_cols=("event_type", "user_id"),
        mode="overwrite", **kw
    )
    return ev


def test_partition_pruning_in_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "store")
    ev = _write_events(spark, sf_dir, path)
    some_dt = ev.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).first()["d"]
    pruned = read_pruned(spark, path, date_from=some_dt, date_to=some_dt)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the date bounds must land in PartitionFilters (directory pruning),
    # not a post-scan Filter node
    scan_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "dt" in scan_line.split("PartitionFilters")[1][:120]
    want = ev.filter(F.date_format("ts", "yyyy-MM-dd") == some_dt).count()
    assert pruned.count() == want


def test_one_file_per_partition(spark, sf_dir, tmp_path):
    path = str(tmp_path / "store")
    _write_events(spark, sf_dir, path)
    for part_dir in glob.glob(f"{path}/dt=*"):
        files = glob.glob(f"{part_dir}/*.parquet")
        assert len(files) == 1, part_dir


def test_hourly_layout_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "store")
    ev = _write_events(spark, sf_dir, path, hourly=True)
    assert glob.glob(f"{path}/dt=*/hour=*"), "no hour directories"
    got = spark.read.parquet(path)
    assert got.count() == ev.count()
    # derived partition columns are additive; original columns survive
    assert set(ev.columns) <= set(got.columns)
