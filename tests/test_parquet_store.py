"""Partitioned parquet store: pruning and layout guarantees."""

from __future__ import annotations

import glob

import pytest

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


def test_stream_to_store_then_compact(spark, sf_dir, tmp_path):
    import glob as _glob

    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        compact_store,
        stream_to_store,
    )
    from transitdata_monitor_data_collector_spark.streaming.jobs import (
        read_parquet_stream,
    )

    path = str(tmp_path / "store")
    stream = read_parquet_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1
    )
    q = stream_to_store(
        stream, path, checkpoint=str(tmp_path / "ckpt"),
        ts_col="ts", available_now=True,
    )
    q.awaitTermination()
    ev = table(spark, sf_dir, "events")
    got = spark.read.parquet(path)
    assert got.count() == ev.count()

    # compact every partition down to one file; reads still see all rows
    part_dirs = _glob.glob(f"{path}/dt=*")
    assert part_dirs
    for d in part_dirs:
        n = compact_store(spark, path, dt=d.rsplit("dt=", 1)[1])
        assert n == 1
        assert len(_glob.glob(f"{d}/*.parquet")) == 1
    assert spark.read.parquet(path).count() == ev.count()
    # pruning still works on the compacted store
    some_dt = part_dirs[0].rsplit("dt=", 1)[1]
    pruned = read_pruned(spark, path, date_from=some_dt, date_to=some_dt)
    assert pruned.count() > 0


def test_zorder_clusters_both_columns(spark, tmp_path):
    """write_zordered: row-group min/max spans must be narrow on BOTH
    cluster columns — a linear sort clusters only its leading column, so
    z-order must beat it decisively on the trailing one."""
    import pyarrow.parquet as pq

    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        write_zordered,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(ev, zpath, ["user_id", "value"], num_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def mean_spans(path, col):
        import glob

        spans, full = [], None
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(float(st.max) - float(st.min))
        return sum(spans) / len(spans)

    # global spans for normalization
    row = ev.agg(
        {"user_id": "max", "value": "max"}
    ).collect()[0]
    lo = ev.agg({"user_id": "min", "value": "min"}).collect()[0]
    uid_span = row["max(user_id)"] - lo["min(user_id)"]
    val_span = row["max(value)"] - lo["min(value)"]

    z_uid = mean_spans(zpath, "user_id") / uid_span
    z_val = mean_spans(zpath, "value") / val_span
    l_uid = mean_spans(lpath, "user_id") / uid_span
    l_val = mean_spans(lpath, "value") / val_span

    # z-order: BOTH columns clustered well below the full range
    assert z_uid < 0.5 and z_val < 0.5, (z_uid, z_val)
    # the linear sort leaves the trailing column poorly clustered (its
    # span shrinks only incidentally, via row-group truncation)
    assert l_val > 0.5, l_val
    # and z-order's trailing-column clustering beats linear's by >= 2x
    assert z_val < l_val / 2, (z_val, l_val)
    # sanity: the linear sort's own leading column is tight
    assert l_uid < 0.3, l_uid


def test_manifest_prunes_files_and_preserves_results(spark, sf_dir, tmp_path):
    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        read_manifest_pruned,
        write_stats_manifest,
    )

    path = str(tmp_path / "mstore")
    ev = table(spark, sf_dir, "events")
    # sort by user_id so per-file user_id ranges are narrow -> skippable
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    n_files = write_stats_manifest(spark, path, ["user_id", "value"])
    assert n_files >= 8
    lo, hi = 3, 5
    pruned = read_manifest_pruned(spark, path, "user_id", lo=lo, hi=hi)
    full = spark.read.parquet(path).filter(
        (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
    )
    assert pruned.count() == full.count() > 0
    # the pruned plan must read strictly fewer files than the store holds
    n_read = len(pruned.inputFiles())
    assert n_read < n_files, f"manifest kept all {n_files} files"


def test_manifest_missing_falls_back(spark, sf_dir, tmp_path):
    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        read_manifest_pruned,
    )

    path = str(tmp_path / "nomanifest")
    table(spark, sf_dir, "events").write.mode("overwrite").parquet(path)
    df = read_manifest_pruned(spark, path, "user_id", lo=0)
    assert df.count() == spark.read.parquet(path).count()


def test_merge_upsert_time_travel_and_retry(spark, sf_dir, tmp_path):
    """The versioned merge table: SCD1 upsert semantics, immutable time
    travel, exactly-once batch retry, schema evolution via by-name union,
    and vacuum retention."""
    from pyspark.sql import functions as F

    from transitdata_monitor_data_collector_spark.sinks import parquet as P

    path = str(tmp_path / "merge_tbl")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .limit(50)
        .cache()
    )
    v0 = P.merge_upsert(spark, path, base, ["user_id"], batch_id="b0")
    assert v0 == 0 and P.table_version(path) == 0

    # update half the keys, insert two new ones, and ADD a column
    some = base.limit(10).select(
        "user_id",
        (F.col("n_events") + 100).alias("n_events"),
        F.lit("updated").alias("note"),
    )
    newbies = spark.createDataFrame(
        [(10**9, 1, "new"), (10**9 + 1, 2, "new")],
        "user_id long, n_events long, note string",
    )
    v1 = P.merge_upsert(
        spark, path, some.unionByName(newbies), ["user_id"], batch_id="b1"
    )
    assert v1 == 1

    cur = P.read_table(spark, path)
    assert cur.count() == base.count() + 2
    updated = {r["user_id"]: r for r in cur.filter("note = 'updated'").collect()}
    assert len(updated) == 10
    base_n = {r["user_id"]: r["n_events"] for r in base.collect()}
    for uid, row in updated.items():
        assert row["n_events"] == base_n[uid] + 100
    # untouched rows carry over with NULL in the evolved column
    assert cur.filter("note IS NULL").count() == base.count() - 10

    # time travel: v0 is immutable and has no evolved column
    old = P.read_table(spark, path, version=0)
    assert old.count() == base.count() and "note" not in old.columns

    # exactly-once: re-delivering batch b1 is a no-op
    assert P.merge_upsert(spark, path, newbies, ["user_id"], batch_id="b1") == 1
    assert P.table_version(path) == 1

    # vacuum keeps the newest version readable
    assert P.vacuum_table(path, keep_last=1) == 1
    assert P.table_version(path) == 1
    with pytest.raises(FileNotFoundError):
        P.read_table(spark, path, version=0)


def test_manifest_reconciles_with_directory(spark, sf_dir, tmp_path):
    """A stale manifest must never change RESULTS: files appended after
    the manifest are read unconditionally, and entries whose file was
    compacted away don't crash the read."""
    import os

    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        read_manifest_pruned,
        write_stats_manifest,
    )

    path = str(tmp_path / "mstore2")
    ev = table(spark, sf_dir, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    (
        half_a.repartitionByRange(4, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    write_stats_manifest(spark, path, ["user_id"])
    # append AFTER the manifest: these rows must still be returned
    half_b.coalesce(1).write.mode("append").parquet(path)
    lo, hi = 3, 5
    pruned = read_manifest_pruned(spark, path, "user_id", lo=lo, hi=hi)
    full = spark.read.parquet(path).filter(F.col("user_id").between(lo, hi))
    assert pruned.count() == full.count() > 0

    # delete a manifest-listed file: the read must not raise
    listed = [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    os.remove(os.path.join(path, listed[0]))
    pruned2 = read_manifest_pruned(spark, path, "user_id", lo=lo, hi=hi)
    full2 = spark.read.parquet(path).filter(F.col("user_id").between(lo, hi))
    assert pruned2.count() == full2.count()


def test_merge_upsert_rejects_ambiguous_updates(spark, tmp_path):
    from transitdata_monitor_data_collector_spark.sinks import parquet as P

    path = str(tmp_path / "merge_guard")
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "user_id long, note string"
    )
    with pytest.raises(ValueError, match="unique, non-null"):
        P.merge_upsert(spark, path, dup, ["user_id"])
    nullkey = spark.createDataFrame(
        [(None, "a")], "user_id long, note string"
    )
    with pytest.raises(ValueError, match="unique, non-null"):
        P.merge_upsert(spark, path, nullkey, ["user_id"])
    # nothing committed by rejected merges
    assert P.table_version(path) is None


def test_compaction_tmp_is_invisible(spark, sf_dir, tmp_path):
    """The compaction temp dir must be hidden from partition discovery —
    a visible sibling dir would read as a bogus dt value and double rows."""
    import os

    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        compact_store,
        write_time_partitioned,
    )

    path = str(tmp_path / "cstore")
    ev = table(spark, sf_dir, "events").limit(500)
    write_time_partitioned(ev, path, ts_col="ts", mode="append")
    write_time_partitioned(ev, path, ts_col="ts", mode="append")
    dt = sorted(
        d for d in os.listdir(path) if d.startswith("dt=")
    )[0].split("=", 1)[1]
    before = spark.read.parquet(path).count()
    compact_store(spark, path, dt)
    # same rows, and no dt=<date>._compact_tmp partition appeared
    assert spark.read.parquet(path).count() == before
    assert not any("._compact_tmp" in d for d in os.listdir(path))
