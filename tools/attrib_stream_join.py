"""Attribute streaming_stream_join's k=20 batch-latency outlier
(r10 VERDICT item 4: max batch 16.4 s at 54,160 peak state rows — 10x
the other twins' ceilings).

Replays the stream-stream join over the sliced k-corpus one-file-per-
trigger (same protocol as tools/stress_streaming.py) and prints PER-BATCH
state-operator internals — numRowsTotal / numRowsUpdated / numRowsRemoved,
allUpdatesTimeMs / allRemovalsTimeMs / commitTimeMs, output rows — so the
outlier decomposes into (a) join-state scan/removal, (b) output
amplification, or (c) state-store commit overhead. Then re-runs with a
TIGHTENED watermark to measure how much of the cost is watermark slack:
the join condition bounds r.ts within [l.ts, l.ts + 1 h], so a 2 h
watermark holds ~3 h of both sides' traffic in state; a tighter delay
keeps correctness for in-order replay (no late data) while shrinking the
scanned state.

Usage: python tools/attrib_stream_join.py [k] [watermark ...]
       (default k=20, watermarks: '2 hours' baseline + '30 minutes')
Prints one JSON line per batch and a summary per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.stress_streaming import N_SLICES, build_replay_dir  # noqa: E402


def run_variant(spark, jobs, replay_dir: str, watermark: str) -> dict:
    from pyspark.sql import functions as F

    raw = jobs.read_parquet_stream(
        spark, f"{replay_dir}/events.parquet", max_files_per_trigger=1
    )
    clicks = raw.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = raw.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = jobs.stream_stream_join_job(
        clicks, purchases, watermark=watermark
    )
    t0 = time.perf_counter()
    mem = jobs.run_to_memory(spark, joined, output_mode="append")
    n_out = mem.count()
    elapsed = round(time.perf_counter() - t0, 1)

    batches = []
    for p in jobs.last_progress():
        if p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue
        so = p.get("stateOperators") or [{}]
        s = so[0]
        batches.append(
            {
                "batch": p.get("batchId"),
                "in_rows": p.get("numInputRows", 0),
                "trigger_ms": p.get("durationMs", {}).get(
                    "triggerExecution", 0
                ),
                "addBatch_ms": p.get("durationMs", {}).get("addBatch", 0),
                "state_rows": s.get("numRowsTotal", 0),
                "updated": s.get("numRowsUpdated", 0),
                "removed": s.get("numRowsRemoved", 0),
                "updates_ms": s.get("allUpdatesTimeMs", 0),
                "removals_ms": s.get("allRemovalsTimeMs", 0),
                "commit_ms": s.get("commitTimeMs", 0),
                "out_rows": (p.get("sink") or {}).get("numOutputRows", 0),
            }
        )
    durations = sorted(b["trigger_ms"] for b in batches)
    summary = {
        "watermark": watermark,
        "total_sec": elapsed,
        "out_rows": n_out,
        "n_batches": len(batches),
        "peak_state_rows": max((b["state_rows"] for b in batches), default=0),
        "batch_ms_max": durations[-1] if durations else 0,
        "batch_ms_p50": durations[len(durations) // 2] if durations else 0,
    }
    return {"summary": summary, "batches": batches}


def main() -> None:
    args = sys.argv[1:]
    nums = [a for a in args if a.isdigit()]
    k = int(nums[0]) if nums else 20
    watermarks = [a for a in args if not a.isdigit()] or [
        "2 hours",
        "30 minutes",
    ]

    from transitdata_monitor_data_collector_spark.session import get_spark
    from transitdata_monitor_data_collector_spark.streaming import jobs

    replay_dir = build_replay_dir(k, N_SLICES)
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )

    # correctness pin: every variant must produce the batch join's exact
    # pair count — the in-order replay admits no late data, so a tighter
    # watermark may only shrink STATE, never the result
    import duckdb

    con = duckdb.connect()
    expected = con.execute(
        "WITH e AS (SELECT * FROM read_parquet("
        f"'{replay_dir}/events.parquet/*.parquet'))"
        " SELECT count(*) FROM e l JOIN e r ON l.user_id = r.user_id"
        " AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR"
        " WHERE l.event_type = 'click' AND r.event_type = 'purchase'"
    ).fetchone()[0]

    for wm in watermarks:
        r = run_variant(spark, jobs, replay_dir, wm)
        print(f"\n=== watermark {wm} ===")
        for b in r["batches"]:
            print(json.dumps(b))
        r["summary"]["oracle_pairs"] = expected
        r["summary"]["oracle_equal"] = r["summary"]["out_rows"] == expected
        print(json.dumps(r["summary"]))


if __name__ == "__main__":
    main()
