"""Per-stage profiler for registry queries (optimization round tooling).

Runs one or more registry queries under the bench's cold protocol
(warm-up, clearCache + empty-cache assert, timed noop-sink run) with the
Spark event log enabled, then parses the event log into a per-stage
attribution: wall time, task time, shuffle read/write bytes, input bytes,
and the first line of the stage's callsite.

Usage:  python tools/profile_query.py <query> [query ...]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
        SPARK_GRAFT_CPUS   (default 32)

This is guide-§1 tooling: measure first, attribute stage by stage. It is
NOT part of the bench contract (bench.py is unchanged by it).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}TB"


def profile(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    evdir = tempfile.mkdtemp(prefix="spark-ev-")

    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    registry = load_all()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from bench import _assert_cold

    windows: dict[str, tuple[float, float, float]] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        warm = time.perf_counter() - t0
        spark.catalog.clearCache()
        _assert_cold(spark, name)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        wall0 = time.time() * 1000
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall1 = time.time() * 1000
        timed = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        windows[name] = (wall0, wall1, timed)
        print(
            f"### {name}: warm-up {warm:.2f}s, timed {timed:.2f}s",
            flush=True,
        )

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: stages within each query's wall-clock window.
    # Spark 4 writes a rolling dir `eventlog_v2_<appid>/events_*`; older
    # layouts write a single file named after the app id.
    paths = []
    for fn in os.listdir(evdir):
        p = os.path.join(evdir, fn)
        if app_id not in fn:
            continue
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, e)
                for e in sorted(os.listdir(p))
                if e.startswith("events")
            )
        else:
            paths.append(p)

    def _lines():
        for p in paths:
            with open(p) as f:
                yield from f

    evfile = paths
    stages = []  # (submit_ms, complete_ms, stage_id, name, metrics)
    jobs = {}  # job_id -> (submit_ms, desc)
    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = (
                    ev["Submission Time"],
                    ev.get("Properties", {}).get("spark.job.description", ""),
                )
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                gc_ms = acc.get("internal.metrics.jvmGCTime", 0)
                deser_ms = acc.get(
                    "internal.metrics.executorDeserializeTime", 0
                )
                fetch_ms = acc.get(
                    "internal.metrics.shuffle.read.fetchWaitTime", 0
                )
                stages.append(
                    {
                        "sub": sub,
                        "comp": comp,
                        "id": si["Stage ID"],
                        "tasks": si.get("Number of Tasks"),
                        "name": si.get("Stage Name", ""),
                        "exec_ms": acc.get("internal.metrics.executorRunTime", 0),
                        "cpu_ns": acc.get("internal.metrics.executorCpuTime", 0),
                        "sr": acc.get(
                            "internal.metrics.shuffle.read.remoteBytesRead", 0
                        )
                        + acc.get(
                            "internal.metrics.shuffle.read.localBytesRead", 0
                        ),
                        "sw": acc.get(
                            "internal.metrics.shuffle.write.bytesWritten", 0
                        ),
                        "inp": acc.get("internal.metrics.input.bytesRead", 0),
                        "spill": acc.get(
                            "internal.metrics.diskBytesSpilled", 0
                        ),
                        "gc": gc_ms,
                        "deser": deser_ms,
                        "fetch": fetch_ms,
                        "py": acc.get("internal.metrics.pythonNumRowsReceived", None),
                        "details": si.get("Details", ""),
                    }
                )

    for name, (w0, w1, timed) in windows.items():
        sel = [s for s in stages if s["sub"] >= w0 - 500 and s["comp"] <= w1 + 500]
        sel.sort(key=lambda s: s["sub"])
        total_wall = sum(s["comp"] - s["sub"] for s in sel)
        print(f"\n=== {name}  timed={timed:.2f}s  "
              f"stages={len(sel)}  sum-stage-wall={total_wall/1000:.2f}s ===")
        print(f"{'stage':>5} {'wall':>7} {'exec':>8} {'cpu':>7} {'gc':>6} "
              f"{'deser':>6} {'fetch':>6} {'tasks':>5} "
              f"{'input':>9} {'sread':>9} {'swrite':>9} {'spill':>8}  name")
        for s in sel:
            wall = (s["comp"] - s["sub"]) / 1000
            if wall < 0.02 and s["sr"] == 0 and s["sw"] == 0:
                continue
            callsite = s["name"].split("\n")[0][:70]
            print(
                f"{s['id']:>5} {wall:>6.2f}s {s['exec_ms']/1000:>7.1f}s "
                f"{s['cpu_ns']/1e9:>6.1f}s {s['gc']/1000:>5.1f}s "
                f"{s['deser']/1000:>5.1f}s {s['fetch']/1000:>5.1f}s "
                f"{s['tasks']:>5} "
                f"{_fmt_bytes(s['inp']):>9} {_fmt_bytes(s['sr']):>9} "
                f"{_fmt_bytes(s['sw']):>9} {_fmt_bytes(s['spill']):>8}  "
                f"{callsite}"
            )
    print(f"\nevent log: {evfile}")


if __name__ == "__main__":
    profile(sys.argv[1:])
