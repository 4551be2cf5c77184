"""Physical Z-order layout pruning at two data scales (r8 VERDICT item 7).

layout_zorder_pruning hash-checks the PLANNING arithmetic and
tests/test_layout_zorder.py pins PartitionFilters pruning at sf0.01; this
probe measures the PHYSICAL claim at scale: write the real layout
(operators/layout.write_zorder, one file per partition) over lineitem at
sf0.1 AND over the k-stress replica (~sf{k/10}), run the same 2-D box
query through the derived candidate partition filter, and record
files-touched / rows-scanned / amplification — beside the same query over
a date-only physical layout (partitionBy 64-day block, the single-
dimension sort a naive lakehouse table gets).

Writes docs/zorder_scale.json; tools/gen_plan_audit.py renders it into
docs/PLAN_AUDIT.md so the evidence survives regeneration.

Usage: python tools/zorder_scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STRESS = os.path.join(REPO, "spark-warehouse", "stress_sf")
BOX = dict(x0=1024, x1=3071, y0=0, y1=255)


def _codes(spark, lineitem_path: str):
    li = spark.read.parquet(lineitem_path)
    return li.select(
        F.datediff(F.to_date("l_shipdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("x"),
        (F.col("l_partkey") % 4096).cast("long").alias("y"),
        "l_orderkey",
    )


def _part_files(root: str, key: str) -> dict[int, int]:
    """{partition value: number of parquet files} under a hive layout."""
    out: dict[int, int] = {}
    for d in os.listdir(root):
        if not d.startswith(f"{key}="):
            continue
        v = int(d.split("=", 1)[1])
        out[v] = sum(
            1
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        )
    return out


def probe_scale(spark, label: str, lineitem_path: str) -> dict:
    from transitdata_monitor_data_collector_spark.operators import layout

    codes = _codes(spark, lineitem_path)
    n_rows = codes.count()
    work = tempfile.mkdtemp(prefix="zscale_")
    res: dict = {"scale": label, "n_rows": n_rows}
    try:
        zdir = os.path.join(work, "z")
        layout.write_zorder(
            codes, zdir, "x", "y", one_file_per_partition=True
        )
        files = _part_files(zdir, "zfile")
        cands = layout.zorder_candidates(**BOX)
        back = spark.read.parquet(zdir)
        box = F.col("x").between(BOX["x0"], BOX["x1"]) & F.col("y").between(
            BOX["y0"], BOX["y1"]
        )
        pruned = back.filter(F.col("zfile").isin(cands) & box)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        pf = next(
            (ln.strip() for ln in plan.splitlines() if "PartitionFilters" in ln),
            "",
        )
        rows_scanned = back.filter(F.col("zfile").isin(cands)).count()
        rows_matched = pruned.count()
        res["zorder"] = {
            "n_files": sum(files.values()),
            "files_touched": sum(files.get(c, 0) for c in cands),
            "rows_scanned": rows_scanned,
            "rows_matched": rows_matched,
            "amplification": round(rows_scanned / max(rows_matched, 1), 2),
            "partition_filter_pushed": "zfile" in pf,
        }
        shutil.rmtree(zdir)

        # date-only physical layout: 64-day blocks (x >> 6), the linear
        # comparison layout of the planning query
        ldir = os.path.join(work, "linear")
        (
            codes.withColumn("xfile", F.shiftright(F.col("x"), 6))
            .repartition(F.col("xfile"))
            .write.mode("overwrite")
            .partitionBy("xfile")
            .parquet(ldir)
        )
        lfiles = _part_files(ldir, "xfile")
        lo, hi = BOX["x0"] >> 6, BOX["x1"] >> 6
        lback = spark.read.parquet(ldir)
        lrows_scanned = lback.filter(
            F.col("xfile").between(lo, hi)
        ).count()
        res["linear"] = {
            "n_files": sum(lfiles.values()),
            "files_touched": sum(
                n for v, n in lfiles.items() if lo <= v <= hi
            ),
            "rows_scanned": lrows_scanned,
            "rows_matched": rows_matched,
            "amplification": round(lrows_scanned / max(rows_matched, 1), 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return res


def main() -> None:
    from transitdata_monitor_data_collector_spark.session import get_spark

    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "24g"},
    )
    scales = [("sf0.1", "/root/testdata/sf0.1/lineitem.parquet")]
    built = [
        m for m in os.listdir(STRESS) if m.startswith("_BUILT_k")
    ] if os.path.isdir(STRESS) else []
    if built:
        k = built[0].removeprefix("_BUILT_k")
        scales.append(
            (f"k{k} (~sf{int(k)/10:g})", os.path.join(STRESS, "lineitem.parquet"))
        )
    results = [probe_scale(spark, label, path) for label, path in scales]
    out = os.path.join(REPO, "docs", "zorder_scale.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
