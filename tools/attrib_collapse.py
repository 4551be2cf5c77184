"""Attribute the r8 honest-cold bench shift per mover (r8 VERDICT item 1).

BENCH_r08 moved three dedup queries >1.3x vs r7, but two effects landed
together: (a) bench.py's cold-cache guard corrected a warm-since-r1
mismeasurement, and (b) commit 96d27b5's exact-duplicate collapse added
real work (hash + rep map + expansion joins) to the same pipelines. This
tool splits them: it times the UNCHANGED registry builders cold (bench.py
protocol: warm-up, clearCache, min of two timed runs through the noop
sink) with the collapse ON (current shape) and OFF (pre-96d27b5 shape,
via operators.dedup.DEDUP_EXACT_FIRST_DEFAULT), at sf0.1 — a dedup-LIGHT
corpus, so the OFF number is the collapse's pure overhead floor, not its
k=20 payoff.

Usage: python tools/attrib_collapse.py [sf_dir]
Prints one JSON object per mover: {on_sec, off_sec, overhead_sec, ratio}.
Results are recorded in docs/BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

MOVERS = ["doc_minhash_lsh_neardup", "doc_dedup_clusters", "doc_curation"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from transitdata_monitor_data_collector_spark.operators import dedup
    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.session import get_spark

    import bench  # the cold-guard protocol lives there

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    registry = load_all()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def cold_min2(name: str) -> float:
        spark.catalog.clearCache()
        run_once(name)  # warm-up: codegen/JIT, not billed

        def timed() -> float:
            spark.catalog.clearCache()
            bench._assert_cold(spark, name)
            return run_once(name)

        return round(min(timed(), timed()), 3)

    out: dict[str, dict[str, float]] = {}
    # restore the module's SHIPPED default (today "auto"), not a literal —
    # if these helpers are ever imported into a longer-lived session, later
    # pipelines must see the stock behavior, not a forced shape
    prev_default = dedup.DEDUP_EXACT_FIRST_DEFAULT
    for name in MOVERS:
        print(f"attrib: {name} (collapse ON)", file=sys.stderr, flush=True)
        dedup.DEDUP_EXACT_FIRST_DEFAULT = True
        on = cold_min2(name)
        print(f"attrib: {name} (collapse OFF)", file=sys.stderr, flush=True)
        dedup.DEDUP_EXACT_FIRST_DEFAULT = False
        try:
            off = cold_min2(name)
        finally:
            dedup.DEDUP_EXACT_FIRST_DEFAULT = prev_default
        out[name] = {
            "collapse_on_sec": on,
            "collapse_off_sec": off,
            "collapse_overhead_sec": round(on - off, 3),
            "on_over_off": round(on / off, 3) if off else None,
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "movers": out}))


if __name__ == "__main__":
    main()
