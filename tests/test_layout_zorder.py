"""Physical half of the Z-order layout story: write_zorder really lays
the table out by Morton file id, zorder_candidates derives the partition
filter for a 2-D box query, and Spark's planner prunes the non-candidate
partitions (PartitionFilters in the scan). The planning arithmetic itself is
hash-checked against DuckDB by the layout_zorder_pruning registry query."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.operators import layout


def _codes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.datediff(F.to_date("l_shipdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("x"),
        (F.col("l_partkey") % 4096).cast("long").alias("y"),
        "l_orderkey",
    )


def test_candidates_decode_roundtrip():
    # every file id must envelope exactly the rows it receives: a box
    # equal to one block's extent selects exactly that file
    for f in (0, 1, 9, 37, 63):
        xb, yb = layout._split_file_id(f, layout.FILE_BITS)
        x0 = xb << 9
        y0 = yb << 9
        cands = layout.zorder_candidates(x0, x0 + 511, y0, y0 + 511)
        assert cands == [f]


def test_candidates_cover_box():
    # the report query's box: x in [1024, 3071], y in [0, 255]
    cands = layout.zorder_candidates(1024, 3071, 0, 255)
    # x blocks 2..5 (512-wide), y block 0 -> ids interleaving those
    assert len(cands) == 4
    for f in cands:
        xb, yb = layout._split_file_id(f, layout.FILE_BITS)
        assert 2 <= xb <= 5 and yb == 0


def test_partition_pruning_end_to_end(spark, oracle_sf_dir, tmp_path):
    path = str(tmp_path / "zordered")
    codes = _codes(spark, oracle_sf_dir)
    layout.write_zorder(codes, path, "x", "y")

    back = spark.read.parquet(path)
    box = (
        F.col("x").between(1024, 3071) & F.col("y").between(0, 255)
    )
    cands = layout.zorder_candidates(1024, 3071, 0, 255)
    pruned = back.filter(F.col("zfile").isin(cands) & box)

    # the candidate list must land in PartitionFilters (directory
    # pruning at planning time), never a post-scan Filter on zfile
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines, "no PartitionFilters in the z-layout scan"
    assert "zfile" in pf_lines[0].split("PartitionFilters")[1][:160], pf_lines[0]

    # pruning is effective: reading ONLY the candidate directories sees
    # the same rows the filtered full-table scan returns
    # candidates are an upper bound — blocks past the data's extent have
    # no directory (xb=5 is empty at this corpus span)
    cand_dirs = [
        d for c in cands
        if os.path.isdir(d := f"{path}/zfile={c}")
    ]
    assert cand_dirs
    cand_only = spark.read.parquet(*cand_dirs).filter(box)
    expect = codes.filter(box).count()
    assert expect > 0
    assert pruned.count() == expect
    assert cand_only.count() == expect
    assert back.filter(box).count() == expect


def test_write_zorder_rejects_out_of_domain(spark, tmp_path):
    """morton_sql interleaves only the low BITS bits, so a negative or
    >= 2**BITS dimension value would land in an unrelated partition and
    candidate-filtered reads would silently drop it — the write must fail
    loudly instead (r8 ADVICE, medium)."""
    import pytest

    bad = spark.createDataFrame(
        [(100, 200, 1), (-3, 50, 2)], "x long, y long, k long"
    )
    with pytest.raises(Exception, match="zorder dimension out of"):
        layout.write_zorder(bad, str(tmp_path / "z_bad"), "x", "y")

    big = spark.createDataFrame(
        [(100, 1 << layout.BITS, 1)], "x long, y long, k long"
    )
    with pytest.raises(Exception, match="zorder dimension out of"):
        layout.write_zorder(big, str(tmp_path / "z_big"), "x", "y")

    # in-domain rows still write fine with validation on
    ok = spark.createDataFrame([(100, 200, 1)], "x long, y long, k long")
    layout.write_zorder(ok, str(tmp_path / "z_ok"), "x", "y")
    assert spark.read.parquet(str(tmp_path / "z_ok")).count() == 1
