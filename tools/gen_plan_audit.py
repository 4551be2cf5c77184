"""Generate docs/PLAN_AUDIT.md — executed physical plans for the bench
headline queries, with the scale-critical properties extracted per plan
(exchanges, joins, codegen coverage, pushed filters).

Run after changing a headline query's plan:

    python tools/gen_plan_audit.py [sf_dir]

This is the ".explain and iterate" loop made auditable: the doc records
WHAT physical plan each headline query runs today, so a plan regression
(a new exchange, a broadcast that became a sort-merge join, a filter
that stopped pushing down) shows up as a diff in review instead of as a
silent slowdown at 100x. Not staleness-gated like REGISTRY.md — plans
legitimately vary with AQE and data stats; regenerate when tuning.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _props(plan: str) -> list[str]:
    out = []
    n_ex = plan.count("Exchange hashpartitioning")
    out.append(f"hash exchanges: {n_ex}")
    for node in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        c = plan.count(f" {node}")
        if c:
            out.append(f"{node}: {c}")
    if "PushedFilters: [" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        nonempty = [p for p in pushed if p.strip()]
        out.append(f"scans with pushed filters: {len(nonempty)}/{len(pushed)}")
    if "PartitionFilters: [" in plan:
        pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        nonempty = [p for p in pf if p.strip()]
        out.append(f"scans with partition filters: {len(nonempty)}/{len(pf)}")
        for p in nonempty:
            out.append(f"  PartitionFilters: [{p.strip()[:200]}]")
    return out


def store_pruning_evidence(spark, sf_dir: str) -> list[str]:
    """Hard row/file-count evidence that the dt-partitioned store prunes:
    materialize events once, read a 5-day window via read_pruned, and
    compare files/rows actually scanned vs the full store; then the same
    through the footer-stats manifest path."""
    import hashlib
    import tempfile

    from transitdata_monitor_data_collector_spark.plans import table
    from transitdata_monitor_data_collector_spark.sinks.parquet import (
        read_manifest_pruned,
        read_pruned,
        write_stats_manifest,
        write_time_partitioned,
    )

    store = os.path.join(
        tempfile.gettempdir(),
        "tmdc_audit_store_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        write_time_partitioned(
            table(spark, sf_dir, "events"), store, ts_col="ts", mode="overwrite"
        )
    from pyspark.sql import functions as F

    def files_read(df) -> int:
        # post-pruning evidence: the files EXECUTION touched, not the
        # relation's file listing (inputFiles() is pre-pruning)
        return df.select(F.input_file_name()).distinct().count()

    full = spark.read.parquet(store)
    pruned = read_pruned(spark, store, date_from="2024-01-08", date_to="2024-01-12")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [p for p in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if p.strip()]
    lines = [
        "## store pruning evidence (events -> dt-partitioned store)",
        "",
        f"- store files: {len(full.inputFiles())}, rows: {full.count()}",
        f"- dir-pruned scan (dt in [2024-01-08, 2024-01-12]): files read "
        f"{files_read(pruned)}, rows: {pruned.count()}",
        f"- PartitionFilters: [{pf[0].strip()[:200] if pf else ''}]",
    ]
    n_files = write_stats_manifest(spark, store, ["ts", "value"])
    man = read_manifest_pruned(
        spark, store, "ts", lo="2024-01-08", hi="2024-01-13"
    )
    lines += [
        f"- footer-stats manifest: {n_files} files indexed; manifest-pruned "
        f"read (ts in [2024-01-08, 2024-01-13]): files selected "
        f"{len(man.inputFiles())}, rows: {man.count()}",
        "",
    ]
    return lines


def zorder_scale_section() -> list[str]:
    """Render docs/zorder_scale.json (tools/zorder_scale_probe.py) — the
    PHYSICAL z-order pruning evidence at two data scales (r8 VERDICT item
    7). Read from the committed JSON so regenerating this doc never needs
    the k-stress corpus on disk."""
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "zorder_scale.json",
    )
    if not os.path.exists(path):
        return []
    with open(path) as f:
        results = json.load(f)
    lines = [
        "## Z-order physical pruning at scale",
        "",
        "Measured by tools/zorder_scale_probe.py: the REAL partitionBy "
        "layout (one file per partition), the same 2-D box query "
        "(ship-day in [1024, 3071] x part-bucket in [0, 255]) read "
        "through the derived candidate partition filter, vs a date-only "
        "(64-day block) physical layout at the same scale.",
        "",
        "| scale | rows | layout | files touched / total | rows scanned"
        " | rows matched | amplification |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        for layout in ("zorder", "linear"):
            d = r.get(layout)
            if not d:
                continue
            lines.append(
                f"| {r['scale']} | {r['n_rows']:,} | {layout} "
                f"| {d['files_touched']}/{d['n_files']} "
                f"| {d['rows_scanned']:,} | {d['rows_matched']:,} "
                f"| {d['amplification']}x |"
            )
    lines.append("")
    return lines


def render(sf_dir: str) -> str:
    import bench
    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    registry = load_all()
    lines = [
        "# Headline-plan audit",
        "",
        "GENERATED by tools/gen_plan_audit.py — executed physical plans "
        f"for bench.py HEADLINE at {sf_dir}.",
        "",
        "Reading note: plans containing `InMemoryRelation` (iterative "
        "trainers that persist per-round tables) inline the cached "
        "subtree's BUILD plan at every reference in the text dump, so "
        "the exchange/scan counts for those queries overcount the text, "
        "not the runtime — each cached table builds once and later "
        "references are `InMemoryTableScan`s.",
        "",
    ]
    # registry queries worth plan evidence that are not bench headliners:
    # the migrated deterministic-IVF top-k pair (store variant shows its
    # list_id PartitionFilters here) and the IVFADC composition
    audit_extra = [
        "emb_ann_ivf_topk",
        "emb_ivf_store_topk",
        "emb_ivfadc_recall_clustered",
    ]
    lines += zorder_scale_section()
    for name in bench.HEADLINE + audit_extra:
        q = registry[name]
        if "streaming" in q.tags:
            lines += [f"## {name}", "", "(streaming replay — plan is per-microbatch; see streaming/jobs.py)", ""]
            continue
        df = q.build(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines += [f"## {name}", ""]
        lines += [f"- {p}" for p in _props(plan)]
        lines += ["", "```", plan.strip()[:4000], "```", ""]
    # bench-only (unregistered) plans worth evidence: the GK-only
    # percentile serving aggregate (r10 VERDICT item 5) — the 100 TB
    # path split from the gated primary's embedded exact-sort audit;
    # expect ONE partial+final HashAggregate pair around one exchange,
    # no Sort, no Window
    from transitdata_monitor_data_collector_spark.plans.relational import (
        approx_percentile_gk_serving,
    )

    df = approx_percentile_gk_serving(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines += ["## agg_approx_percentile_gk_only (bench-only serving path)", ""]
    lines += [f"- {p}" for p in _props(plan)]
    lines += ["", "```", plan.strip()[:4000], "```", ""]
    lines += store_pruning_evidence(spark, sf_dir)
    return "\n".join(lines) + "\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLAN_AUDIT.md")
    with open(path, "w") as f:
        f.write(render(sf_dir))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
