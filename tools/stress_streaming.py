"""k=20 MULTI-MICRO-BATCH replay certification for the streaming stateful
twins (r9 VERDICT item 1).

The r8 full-registry k=20 sweep ran every streaming twin Spark-vs-DuckDB,
but ``read_parquet_stream`` over one big parquet file collapses the replay
into one or two micro-batches — state-store growth and watermark eviction
under ~sf2 volume (the reference's whole job is this streaming state,
MqttTopicMonitorListener.java:73-92) were never exercised across real
batch boundaries. This tool:

1. slices the cached k=20 stress corpus's events table into
   ``N_SLICES`` time-contiguous parquet files (mtime = delivery order,
   oldest first — the file source's processing order);
2. replays each twin's UNCHANGED registry builder one-file-per-trigger
   (``SPARK_GRAFT_REPLAY_MAX_FILES=1``), so the stateful job crosses
   N_SLICES real micro-batch boundaries at 20x duplicate pressure;
3. asserts the result equals the same builder's DuckDB oracle over the
   sliced corpus (full cross-engine value check, not just self-equality);
4. records peak state rows and the micro-batch duration distribution
   from StreamingQueryProgress — the at-scale evidence docs/STRESS.md
   cites.

Usage: python tools/stress_streaming.py [k] [n_slices] [query ...]
Prints one JSON line per twin + a summary line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.stress_parity import DIMS, FACTS, OUT, build_stress_dir  # noqa: E402

#: the stateful twins the certification targets (r9 VERDICT item 1 names
#: these five; all are oracle-backed)
TWINS = [
    "streaming_windowed_rate",
    "streaming_incremental_rollup",
    "streaming_bitmap_distinct",
    "streaming_cms_heavy_hitters",
    "streaming_deriv_predict_linear",
]

N_SLICES = 16

#: Queries whose registered batch-equality is SINGLE-BATCH-replay-
#: conditional by documented design: dropDuplicatesWithinWatermark only
#: dedups within the watermark, so once a multi-batch replay advances
#: the watermark and EVICTS a key's state, a later re-occurrence
#: legitimately survives — count(survivors) then exceeds the batch
#: DISTINCT (observed at k=20 x 16 slices: 28,614 survivors vs 25,421
#: distinct per broker). The multi-batch certification checks the
#: semantic INVARIANT instead: distinct <= survivors <= raw rows,
#: per group.
BOUNDED_DEDUP = {"streaming_dedup_within_watermark"}


def _dedup_bounds_check(con, sdict_rows: list[dict], oracle_sql: str) -> str | None:
    """Invariant check for BOUNDED_DEDUP queries: per group, batch
    DISTINCT (the registered oracle = lower bound) <= surviving rows <=
    raw message count (upper bound). Returns an error string or None.

    The group-key and count columns are taken BY NAME from the oracle's
    own output schema (first column = group key, second = count) and the
    Spark rows arrive as name->value dicts — r10 ADVICE: the old
    positional dict(sorted-column tuples) only worked because the one
    BOUNDED_DEDUP entry's two columns happened to sort as (key, count);
    any wider or differently-ordered entry would silently misparse."""
    from transitdata_monitor_data_collector_spark.plans.monitoring import (
        BROKER_SQL,
    )

    ores = con.execute(oracle_sql)
    key_col, cnt_col = ores.description[0][0], ores.description[1][0]
    lower = dict(ores.fetchall())
    upper = dict(
        con.execute(
            f"SELECT {BROKER_SQL} AS broker, count(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    missing = {key_col, cnt_col} - set(sdict_rows[0]) if sdict_rows else set()
    if missing:
        return (
            f"spark result lacks oracle columns {sorted(missing)}: "
            f"{sorted(sdict_rows[0]) if sdict_rows else []}"
        )
    got = {r[key_col]: r[cnt_col] for r in sdict_rows}
    if set(got) != set(lower):
        return f"group keys differ: {sorted(got)} vs {sorted(lower)}"
    for k, v in got.items():
        if not (lower[k] <= v <= upper[k]):
            return (
                f"{k}: survivors {v} outside [distinct {lower[k]}, "
                f"raw {upper[k]}]"
            )
    return None


def build_replay_dir(k: int, n_slices: int = N_SLICES) -> str:
    """A replay-shaped copy of the k-stress dir: every table symlinked,
    except events.parquet which becomes a DIRECTORY of ``n_slices``
    time-contiguous slice files with ascending mtimes (delivery order =
    event-time order; disorder replay is covered in-suite at sf0.1 by
    tests/test_disorder_replay.py)."""
    import duckdb

    sf = build_stress_dir(k)
    root = f"{OUT}_replay_k{k}_s{n_slices}"
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    for t in list(FACTS) + DIMS:
        if t == "events":
            continue
        dst = os.path.join(root, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf, f"{t}.parquet"), dst)
    ev_dir = os.path.join(root, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE ev AS SELECT *, ntile({n_slices}) OVER "
        f"(ORDER BY ts, event_id) AS _slice "
        f"FROM read_parquet('{sf}/events.parquet')"
    )
    for s in range(1, n_slices + 1):
        dst = os.path.join(ev_dir, f"slice_{s:02d}.parquet")
        con.execute(
            f"COPY (SELECT * EXCLUDE (_slice) FROM ev WHERE _slice = {s} "
            f"ORDER BY ts, event_id) TO '{dst}' (FORMAT PARQUET)"
        )
        t = 1_700_000_000 + 60 * s
        os.utime(dst, (t, t))
    with open(marker, "w") as f:
        f.write("ok")
    return root


def _progress_metrics(progress: list[dict]) -> dict:
    """Peak state rows + micro-batch duration distribution from the
    replay's StreamingQueryProgress events."""
    fed = [p for p in progress if p.get("numInputRows", 0) > 0]
    durations = sorted(
        p.get("durationMs", {}).get("triggerExecution", 0) for p in fed
    )
    state_rows = [
        sum(s.get("numRowsTotal", 0) for s in p.get("stateOperators", []))
        for p in progress
    ]

    def pct(q: float) -> int:
        return durations[min(len(durations) - 1, int(q * len(durations)))] if durations else 0

    return {
        "n_batches": len(progress),
        "n_batches_with_rows": len(fed),
        "input_rows": sum(p.get("numInputRows", 0) for p in fed),
        "peak_state_rows": max(state_rows) if state_rows else 0,
        "batch_ms": {
            "mean": round(sum(durations) / len(durations), 1) if durations else 0,
            "p50": pct(0.5),
            "p95": pct(0.95),
            "max": durations[-1] if durations else 0,
        },
    }


def run(k: int, n_slices: int, queries: list[str]) -> int:
    import datetime as _dt
    import time

    import duckdb

    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.session import get_spark
    from transitdata_monitor_data_collector_spark.streaming import jobs

    print(f"oracle engine: duckdb {duckdb.__version__}")
    replay_dir = build_replay_dir(k, n_slices)
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )
    registry = load_all()
    con = duckdb.connect()
    for t in list(FACTS) + DIMS:
        src = (
            f"{replay_dir}/events.parquet/*.parquet"
            if t == "events"
            else f"{replay_dir}/{t}.parquet"
        )
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    def norm(v):
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return _dt.datetime(v.year, v.month, v.day)
        return v

    def skey(row):
        return tuple((v is None, str(v)) for v in row)

    failures = 0
    # r10 ADVICE: save the caller's value (if any) and RESTORE it in the
    # finally block instead of unconditionally popping — an exported
    # override must survive this tool, not be silently deleted.
    _prior_max_files = os.environ.get("SPARK_GRAFT_REPLAY_MAX_FILES")
    os.environ["SPARK_GRAFT_REPLAY_MAX_FILES"] = "1"
    try:
        for name in queries:
            q = registry[name]
            try:
                t0 = time.perf_counter()
                sdf = q.build(spark, replay_dir)
                scols = sorted(sdf.columns)
                raw_rows = sdf.collect()
                srows = sorted(
                    (tuple(norm(r[c]) for c in scols) for r in raw_rows),
                    key=skey,
                )
                elapsed = round(time.perf_counter() - t0, 1)
                metrics = _progress_metrics(jobs.last_progress())
            except Exception as exc:
                failures += 1
                msg = str(exc).splitlines()[0][:200]
                print(f"{name}: ERROR (spark side: {msg})")
                continue
            if metrics["n_batches_with_rows"] < max(2, n_slices // 2):
                failures += 1
                print(
                    f"{name}: ERROR (replay collapsed into "
                    f"{metrics['n_batches_with_rows']} fed micro-batches — "
                    "not a multi-batch certification)"
                )
                continue
            if name in BOUNDED_DEDUP:
                try:
                    err = _dedup_bounds_check(
                        con, [r.asDict() for r in raw_rows], q.oracle
                    )
                except Exception as exc:
                    err = str(exc).splitlines()[0][:200]
                if err:
                    failures += 1
                    print(f"{name}: BOUNDS VIOLATION ({err})")
                else:
                    print(
                        json.dumps(
                            {
                                "query": name,
                                "rows": len(srows),
                                "bounds_check": "distinct<=survivors<=raw",
                                "replay_sec": elapsed,
                                **metrics,
                            }
                        )
                    )
                continue
            try:
                ores = con.execute(q.oracle)
                ocols = sorted(d[0] for d in ores.description)
                names_ = [d[0] for d in ores.description]
                idx = [names_.index(c) for c in ocols]
                orows = sorted(
                    (tuple(norm(r[i]) for i in idx) for r in ores.fetchall()),
                    key=skey,
                )
            except Exception as exc:
                failures += 1
                msg = str(exc).splitlines()[0][:200]
                print(f"{name}: ERROR (oracle side: {msg})")
                continue
            ok = scols == ocols and srows == orows
            if not ok:
                failures += 1
                print(
                    f"{name}: MISMATCH (schema_match={scols == ocols}, "
                    f"spark={len(srows)} oracle={len(orows)} rows)"
                )
                for a, b in [(a, b) for a, b in zip(srows, orows) if a != b][:3]:
                    print(f"  spark : {a}\n  oracle: {b}")
                continue
            print(
                json.dumps(
                    {
                        "query": name,
                        "rows": len(srows),
                        "oracle_match": True,
                        "replay_sec": elapsed,
                        **metrics,
                    }
                )
            )
    finally:
        if _prior_max_files is None:
            os.environ.pop("SPARK_GRAFT_REPLAY_MAX_FILES", None)
        else:
            os.environ["SPARK_GRAFT_REPLAY_MAX_FILES"] = _prior_max_files
    print(
        f"\nstreaming replay k={k} x {n_slices} slices: "
        f"{len(queries) - failures}/{len(queries)} green"
    )
    return failures


def run_restart(k: int, n_slices: int = N_SLICES, split: int = None) -> int:
    """Durable-checkpoint RESTART certification at k (r10, T4 at scale):
    each stateful job replays the FIRST half of the sliced k-corpus
    one-file-per-trigger into a parquet store via foreachBatch (the
    production update-mode-to-idempotent-store pattern), the query is
    STOPPED, the second half of the slice files lands, and a NEW query
    restarts from the SAME checkpoint — it must restore state, process
    only the new files, and the store's idempotent max-recovery must
    equal the full-corpus oracle. Covers the built-in agg state (bitmap
    words, CMS cells, cumulative counters) and the custom
    applyInPandasWithState counter (UD4) across a cold start.
    """
    import glob as _glob
    import shutil
    import tempfile

    import duckdb

    from pyspark.sql import functions as F

    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.plans.monitoring import (
        BROKER_SQL,
        DASHBOARD_FILTERS,
        TOPIC_SQL,
    )
    from transitdata_monitor_data_collector_spark.session import get_spark
    from transitdata_monitor_data_collector_spark.streaming import jobs

    split = split or n_slices // 2
    print(f"oracle engine: duckdb {duckdb.__version__}")
    replay_dir = build_replay_dir(k, n_slices)
    slices = sorted(
        _glob.glob(os.path.join(replay_dir, "events.parquet", "*.parquet"))
    )
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )
    registry = load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{replay_dir}/events.parquet/*.parquet')"
    )

    def msgs(stream):
        return stream.select(
            F.expr(BROKER_SQL).alias("broker"),
            F.expr(TOPIC_SQL).alias("topic"),
            "ts",
            "event_id",
        )

    #: name -> (stream -> job df, sink-recovery fn, oracle fn)
    def bitmap_recover(sink_df):
        final = sink_df.groupBy("day", "word_i").agg(
            F.max("mask").alias("mask")
        )
        return sorted(
            (str(r["day"]), r["n"])
            for r in final.groupBy("day")
            .agg(F.sum(F.bit_count("mask")).cast("long").alias("n"))
            .collect()
        )

    def counter_recover(sink_df):
        return sorted(
            (r["broker"], r["topic_filter"], r["n"])
            for r in sink_df.groupBy("broker", "topic_filter")
            .agg(F.max("messages_received_total").cast("long").alias("n"))
            .collect()
        )

    def cms_recover(sink_df):
        return sorted(
            (r["row_i"], r["col_i"], r["cnt"])
            for r in sink_df.groupBy("row_i", "col_i")
            .agg(F.max("cnt").cast("long").alias("cnt"))
            .collect()
        )

    counter_oracle_sql = registry["streaming_counter_totals"].oracle

    def counter_oracle():
        return sorted(
            (b, f, int(n))
            for b, f, n in con.execute(counter_oracle_sql).fetchall()
        )

    def bitmap_oracle():
        return sorted(
            (str(d)[:10], int(n))
            for d, n in con.execute(
                "SELECT CAST(ts AS DATE) AS day, "
                "CAST(count(DISTINCT user_id) AS BIGINT) AS n "
                "FROM events GROUP BY 1 ORDER BY 1"
            ).fetchall()
        )

    def cms_oracle():
        # batch-built cells on the Spark side (deterministic integers)
        ev = spark.read.parquet(f"{replay_dir}/events.parquet")
        cells = jobs.cms_cells_job(ev)  # works on batch frames too
        return sorted(
            (r["row_i"], r["col_i"], r["cnt"])
            for r in cells.collect()
        )

    JOBS = {
        "bitmap_distinct": (
            lambda s: jobs.bitmap_distinct_job(s),
            bitmap_recover,
            bitmap_oracle,
        ),
        "cms_cells": (
            lambda s: jobs.cms_cells_job(s),
            cms_recover,
            cms_oracle,
        ),
        "counter_totals": (
            lambda s: jobs.cumulative_counter_job(msgs(s), DASHBOARD_FILTERS),
            counter_recover,
            counter_oracle,
        ),
        "stateful_counter": (
            lambda s: jobs.stateful_counter_job(msgs(s), DASHBOARD_FILTERS),
            counter_recover,
            counter_oracle,
        ),
    }

    failures = 0
    for name, (build_job, recover, oracle) in JOBS.items():
        work = tempfile.mkdtemp(prefix=f"restart_{name}_")
        src = os.path.join(work, "events.parquet")
        sink = os.path.join(work, "store")
        ckpt = os.path.join(work, "ckpt")
        os.makedirs(src)

        def phase(tag: str) -> int:
            stream = jobs.read_parquet_stream(
                spark, src, max_files_per_trigger=1
            )
            job = build_job(stream)

            def write_batch(df, epoch_id):
                df.write.mode("append").parquet(sink)

            q = (
                job.writeStream.foreachBatch(write_batch)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            n_batches = len(q.recentProgress)
            q.stop()
            q.awaitTermination()
            return n_batches

        try:
            for f in slices[:split]:
                os.link(f, os.path.join(src, os.path.basename(f)))
            b1 = phase("p1")
            for f in slices[split:]:
                os.link(f, os.path.join(src, os.path.basename(f)))
            b2 = phase("p2")
            got = recover(spark.read.parquet(sink))
            want = oracle()
            ok = got == want
            if not ok:
                failures += 1
                print(f"{name}: MISMATCH after restart "
                      f"(got {len(got)} rows, want {len(want)})")
                for a, b in [(a, b) for a, b in zip(got, want) if a != b][:3]:
                    print(f"  got : {a}\n  want: {b}")
            else:
                print(
                    json.dumps(
                        {
                            "job": name,
                            "restart_ok": True,
                            "rows": len(got),
                            "phase1_batches": b1,
                            "phase2_batches": b2,
                        }
                    )
                )
            if ok and not (b2 <= (n_slices - split) + 2):
                failures += 1
                print(
                    f"{name}: ERROR restart reprocessed old files "
                    f"({b2} batches for {n_slices - split} new slices)"
                )
        except Exception as exc:
            failures += 1
            msg = str(exc).splitlines()[0][:200]
            print(f"{name}: ERROR ({msg})")
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(
        f"\nrestart certification k={k} ({split}+{n_slices - split} slices):"
        f" {len(JOBS) - failures}/{len(JOBS)} green"
    )
    return failures


def build_disorder_dir(k: int, n_slices: int = N_SLICES) -> tuple[str, list[int]]:
    """A DISORDER-delivered copy of the replay dir (r10 VERDICT stretch
    item 8): same time-contiguous slice files, but mtimes (= file-source
    delivery order) in adjacent-pair-swap order (2,1,4,3,...) so event
    time REGRESSES by a full slice span between consecutive
    micro-batches — the reorder a distributed multi-broker fan-in
    actually produces, at k-stress volume. Slice files are COPIES, not
    hardlinks: hardlinks share the inode, so re-stamping mtimes here
    would silently scramble the in-order dir's delivery order too.
    Returns (dir, delivery order as 1-based slice numbers)."""
    import shutil

    base = build_replay_dir(k, n_slices)
    delivery = []
    for i in range(1, n_slices + 1, 2):
        pair = [i + 1, i] if i + 1 <= n_slices else [i]
        delivery.extend(pair)
    root = f"{OUT}_replay_k{k}_s{n_slices}_disorder"
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root, delivery
    os.makedirs(root, exist_ok=True)
    for t in list(FACTS) + DIMS:
        if t == "events":
            continue
        dst = os.path.join(root, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(base, f"{t}.parquet"), dst)
    ev_dir = os.path.join(root, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    for pos, s in enumerate(delivery):
        src = os.path.join(base, "events.parquet", f"slice_{s:02d}.parquet")
        dst = os.path.join(ev_dir, f"slice_{s:02d}.parquet")
        shutil.copyfile(src, dst)
        t = 1_700_000_000 + 60 * pos
        os.utime(dst, (t, t))
    with open(marker, "w") as f:
        f.write("ok")
    return root, delivery


#: the watermark-EVICTING twins targeted by the k-scale disorder replay
EVICTION_TWINS = [
    "streaming_windowed_rate",
    "streaming_session_windows",
    "streaming_dedup_within_watermark",
]


def run_disorder(k: int, n_slices: int = N_SLICES) -> int:
    """k-scale DISORDER replay of the watermark-evicting twins (r10
    VERDICT stretch item 8 — the last untested combination: scale x
    disorder x state eviction).

    The in-suite slice-swap test (tests/test_disorder_replay.py) runs at
    fixture scale; the k=20 replay (``run``) delivers in order. Here the
    sliced k-corpus arrives adjacent-pair-swapped, one file per trigger:

    - streaming_windowed_rate / streaming_session_windows run COMPLETE
      mode, where Spark retains all aggregation state and late rows
      still aggregate — so they must be exactly ORACLE-EQUAL even though
      event time regresses a full slice span between batches;
    - streaming_dedup_within_watermark (append mode) REALLY drops rows
      that regress below the watermark, so its bounds are checked
      against a DuckDB SIMULATION of the admitted rows: batch i's
      watermark is max event time of previously-delivered slices minus
      the 10-minute delay, and distinct(admitted) <= survivors <=
      count(admitted) per broker.
    """
    import datetime as _dt
    import time

    import duckdb

    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.session import get_spark
    from transitdata_monitor_data_collector_spark.streaming import jobs

    print(f"oracle engine: duckdb {duckdb.__version__}")
    root, delivery = build_disorder_dir(k, n_slices)
    print(f"delivery order: {delivery}")
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )
    registry = load_all()
    con = duckdb.connect()
    for t in list(FACTS) + DIMS:
        src = (
            f"{root}/events.parquet/*.parquet"
            if t == "events"
            else f"{root}/{t}.parquet"
        )
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    # watermark simulation for the dedup twin: per delivered slice, the
    # threshold is the max ts over PREVIOUSLY delivered slices minus the
    # 10-minute dropDuplicatesWithinWatermark delay (the engine updates
    # the watermark at the end of each micro-batch)
    slice_max = {
        s: con.execute(
            "SELECT max(ts) FROM read_parquet("
            f"'{root}/events.parquet/slice_{s:02d}.parquet')"
        ).fetchone()[0]
        for s in delivery
    }
    parts = []
    seen_max: _dt.datetime | None = None
    for s in delivery:
        p = f"{root}/events.parquet/slice_{s:02d}.parquet"
        if seen_max is None:
            parts.append(f"SELECT * FROM read_parquet('{p}')")
        else:
            thr = seen_max - _dt.timedelta(minutes=10)
            parts.append(
                f"SELECT * FROM read_parquet('{p}') "
                f"WHERE ts >= TIMESTAMP '{thr}'"
            )
        seen_max = (
            slice_max[s] if seen_max is None else max(seen_max, slice_max[s])
        )
    con.execute(
        "CREATE VIEW admitted AS " + " UNION ALL ".join(parts)
    )

    def norm(v):
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return _dt.datetime(v.year, v.month, v.day)
        return v

    def skey(row):
        return tuple((v is None, str(v)) for v in row)

    failures = 0
    _prior = os.environ.get("SPARK_GRAFT_REPLAY_MAX_FILES")
    os.environ["SPARK_GRAFT_REPLAY_MAX_FILES"] = "1"
    try:
        for name in EVICTION_TWINS:
            q = registry[name]
            try:
                t0 = time.perf_counter()
                sdf = q.build(spark, root)
                scols = sorted(sdf.columns)
                raw_rows = sdf.collect()
                srows = sorted(
                    (tuple(norm(r[c]) for c in scols) for r in raw_rows),
                    key=skey,
                )
                elapsed = round(time.perf_counter() - t0, 1)
                metrics = _progress_metrics(jobs.last_progress())
            except Exception as exc:
                failures += 1
                print(f"{name}: ERROR ({str(exc).splitlines()[0][:200]})")
                continue
            if metrics["n_batches_with_rows"] < max(2, n_slices // 2):
                failures += 1
                print(
                    f"{name}: ERROR (disorder replay collapsed into "
                    f"{metrics['n_batches_with_rows']} fed micro-batches)"
                )
                continue
            if name in BOUNDED_DEDUP:
                ores = con.execute(q.oracle)
                key_col, cnt_col = (
                    ores.description[0][0],
                    ores.description[1][0],
                )
                got = {r[key_col]: r[cnt_col] for r in
                       (rr.asDict() for rr in raw_rows)}
                lower = dict(
                    con.execute(_dedup_disorder_lower_sql()).fetchall()
                )
                upper = dict(
                    con.execute(_dedup_disorder_upper_sql()).fetchall()
                )
                err = None
                if set(got) != set(lower):
                    err = f"group keys differ: {sorted(got)} vs {sorted(lower)}"
                else:
                    for kk, v in got.items():
                        if not (lower[kk] <= v <= upper[kk]):
                            err = (
                                f"{kk}: survivors {v} outside [admitted-"
                                f"distinct {lower[kk]}, admitted-raw "
                                f"{upper[kk]}]"
                            )
                            break
                if err:
                    failures += 1
                    print(f"{name}: BOUNDS VIOLATION ({err})")
                else:
                    print(
                        json.dumps(
                            {
                                "query": name,
                                "rows": len(srows),
                                "bounds_check": "admitted-distinct<="
                                "survivors<=admitted-raw",
                                "replay_sec": elapsed,
                                **metrics,
                            }
                        )
                    )
                continue
            ores = con.execute(q.oracle)
            ocols = sorted(d[0] for d in ores.description)
            names_ = [d[0] for d in ores.description]
            idx = [names_.index(c) for c in ocols]
            orows = sorted(
                (tuple(norm(r[i]) for i in idx) for r in ores.fetchall()),
                key=skey,
            )
            if scols == ocols and srows == orows:
                print(
                    json.dumps(
                        {
                            "query": name,
                            "rows": len(srows),
                            "oracle_match": True,
                            "replay_sec": elapsed,
                            **metrics,
                        }
                    )
                )
            else:
                failures += 1
                print(
                    f"{name}: MISMATCH (schema_match={scols == ocols}, "
                    f"spark={len(srows)} oracle={len(orows)} rows)"
                )
                for a, b in [(a, b) for a, b in zip(srows, orows) if a != b][:3]:
                    print(f"  spark : {a}\n  oracle: {b}")
    finally:
        if _prior is None:
            os.environ.pop("SPARK_GRAFT_REPLAY_MAX_FILES", None)
        else:
            os.environ["SPARK_GRAFT_REPLAY_MAX_FILES"] = _prior
    print(
        f"\ndisorder replay k={k} x {n_slices} swapped slices: "
        f"{len(EVICTION_TWINS) - failures}/{len(EVICTION_TWINS)} green"
    )
    return failures


def _dedup_disorder_lower_sql() -> str:
    from transitdata_monitor_data_collector_spark.plans.monitoring import (
        BROKER_SQL,
        TOPIC_SQL,
    )

    return (
        f"WITH m AS (SELECT {BROKER_SQL} AS broker, {TOPIC_SQL} AS topic "
        "FROM admitted) "
        "SELECT broker, count(DISTINCT topic) FROM m GROUP BY 1"
    )


def _dedup_disorder_upper_sql() -> str:
    from transitdata_monitor_data_collector_spark.plans.monitoring import (
        BROKER_SQL,
    )

    return (
        f"SELECT {BROKER_SQL} AS broker, count(*) FROM admitted GROUP BY 1"
    )


def run_restart_eviction(k: int, n_slices: int = N_SLICES, split: int = None) -> int:
    """Durable-checkpoint RESTART certification for the watermark-
    EVICTING jobs (r10 VERDICT item 3): windowed_rate, session_windows,
    dedup_within_watermark.

    The r10 ``--restart`` pass covered only monotone/counter state
    (bitmap, CMS, counter x2) — none of which can exhibit the eviction
    family's restart failure mode: a checkpoint recovery that restores
    state but RESETS THE WATERMARK would re-admit late data the job
    already evicted. This cert replays the first ``split`` slices of
    the k-corpus one-file-per-trigger into a parquet store, STOPS the
    query, lands the second half PLUS a LATE-PROBE file (a byte copy of
    the OLDEST slice — every row far below any correctly-restored
    watermark), restarts from the same checkpoint, and asserts:

    1. watermark RESTORED: the restarted query's first fed progress
       reports an event-time watermark >= the pre-stop watermark (a
       reset would read the 1970 epoch);
    2. late probe EVICTED, not re-admitted: the restart phase reports
       numRowsDroppedByWatermark > 0 and the final recovered result is
       oracle-equal over the ORIGINAL corpus (probe duplicates, if
       admitted, would corrupt it);
    3. zero reprocessing: restart batch count is bounded by the number
       of NEW files;
    4. full-result correctness: windowed_rate / session_windows equal
       their registry DuckDB oracles; the dedup twin passes the
       documented distinct <= survivors <= raw bounds (its
       batch-equality is single-batch-conditional by design).

    session_windows (append mode — Spark does not support update-mode
    session aggs) needs one extra SENTINEL file: a single far-future
    event for an in-filter user pushes the final watermark past every
    real session's close so append mode flushes them all; the
    sentinel's own session stays in state, unemitted, invisible to the
    comparison.
    """
    import glob as _glob
    import shutil
    import tempfile

    import duckdb

    from pyspark.sql import functions as F

    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.plans.monitoring import (
        BROKER_SQL,
        DASHBOARD_FILTERS,
        TOPIC_SQL,
    )
    from transitdata_monitor_data_collector_spark.session import get_spark
    from transitdata_monitor_data_collector_spark.streaming import jobs

    split = split or n_slices // 2
    print(f"oracle engine: duckdb {duckdb.__version__}")
    replay_dir = build_replay_dir(k, n_slices)
    slices = sorted(
        _glob.glob(os.path.join(replay_dir, "events.parquet", "*.parquet"))
    )
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )
    registry = load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{replay_dir}/events.parquet/*.parquet')"
    )

    def msgs(stream):
        return stream.select(
            F.expr(BROKER_SQL).alias("broker"),
            F.expr(TOPIC_SQL).alias("topic"),
            "ts",
            "event_id",
        )

    # sentinel: one far-future event for an in-filter user (user_id 5 <
    # the session builder's user_id < 10 cut) — 10x the 2 h watermark
    # past the corpus max, so watermark - 2 h still clears every real
    # session end + gap
    far_ts = con.execute(
        "SELECT max(ts) + INTERVAL 30 DAY FROM events"
    ).fetchone()[0]
    probe_src = slices[0]

    def windowed_recover(sink_df):
        final = sink_df.groupBy(
            "window_start", "broker", "topic_filter"
        ).agg(F.max("n").alias("n"))
        return sorted(
            (str(r["window_start"]), r["broker"], r["topic_filter"],
             int(r["n"]))
            for r in final.collect()
        )

    def windowed_oracle():
        return sorted(
            (str(w), b, tf, int(n))
            for w, b, tf, n, _rate in con.execute(
                registry["streaming_windowed_rate"].oracle
            ).fetchall()
        )

    def session_recover(sink_df):
        # append mode emits each closed session once; an epoch replay
        # would duplicate rows byte-identically -> distinct over the
        # epoch-stamped rows collapses replays, keeps real re-emissions
        final = sink_df.select(
            "user_id", "session_start", "n_events", "_epoch"
        ).distinct()
        return sorted(
            (int(r["user_id"]), str(r["session_start"]), int(r["n_events"]))
            for r in final.collect()
        )

    def session_oracle():
        return sorted(
            (int(u), str(s), int(n))
            for u, s, n in con.execute(
                registry["streaming_session_windows"].oracle
            ).fetchall()
        )

    def dedup_recover(sink_df):
        survivors = sink_df.select(
            "broker", "topic", "ts", "event_id", "_epoch"
        ).distinct()
        return sorted(
            (r["broker"], int(r["n"]))
            for r in survivors.groupBy("broker")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    def dedup_check(got_rows) -> str | None:
        lower = dict(
            con.execute(
                registry["streaming_dedup_within_watermark"].oracle
            ).fetchall()
        )
        upper = dict(
            con.execute(
                f"SELECT {BROKER_SQL} AS broker, count(*) FROM events "
                "GROUP BY 1"
            ).fetchall()
        )
        got = dict(got_rows)
        if set(got) != set(lower):
            return f"group keys differ: {sorted(got)} vs {sorted(lower)}"
        for key, v in got.items():
            if not (lower[key] <= v <= upper[key]):
                return (
                    f"{key}: survivors {v} outside "
                    f"[distinct {lower[key]}, raw {upper[key]}]"
                )
        return None

    JOBS = {
        "windowed_rate": {
            "build": lambda s: jobs.windowed_rate_job(
                msgs(s), DASHBOARD_FILTERS
            ),
            "mode": "update",
            "recover": windowed_recover,
            "oracle": windowed_oracle,
            "sentinel": False,
        },
        "session_windows": {
            "build": lambda s: jobs.session_window_job(
                s.filter(F.col("user_id") < 10)
            ),
            "mode": "append",
            "recover": session_recover,
            "oracle": session_oracle,
            "sentinel": True,
        },
        "dedup_within_watermark": {
            "build": lambda s: jobs.dedup_within_watermark_job(msgs(s)),
            "mode": "append",
            "recover": dedup_recover,
            "oracle": None,  # bounds-checked (eviction by design)
            "bounds": dedup_check,
            "sentinel": False,
        },
    }

    def prog_dicts(q) -> list[dict]:
        out = []
        for p in q.recentProgress:
            out.append(p if isinstance(p, dict) else json.loads(p.json))
        return out

    def wm_of(p: dict) -> str:
        return (p.get("eventTime") or {}).get("watermark") or ""

    def dropped_of(p: dict) -> int:
        return sum(
            s.get("numRowsDroppedByWatermark", 0)
            for s in p.get("stateOperators", [])
        )

    failures = 0
    for name, spec in JOBS.items():
        work = tempfile.mkdtemp(prefix=f"restart_ev_{name}_")
        src = os.path.join(work, "events.parquet")
        sink = os.path.join(work, "store")
        ckpt = os.path.join(work, "ckpt")
        os.makedirs(src)

        def phase() -> list[dict]:
            stream = jobs.read_parquet_stream(
                spark, src, max_files_per_trigger=1
            )
            job = spec["build"](stream)

            def write_batch(df, epoch_id):
                df.withColumn("_epoch", F.lit(epoch_id)).write.mode(
                    "append"
                ).parquet(sink)

            q = (
                job.writeStream.foreachBatch(write_batch)
                .outputMode(spec["mode"])
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            progress = prog_dicts(q)
            q.stop()
            q.awaitTermination()
            return progress

        try:
            for fpath in slices[:split]:
                os.link(fpath, os.path.join(src, os.path.basename(fpath)))
            p1 = phase()
            wm1 = max((wm_of(p) for p in p1), default="")
            # phase 2 corpus: the remaining slices, then the LATE PROBE
            # (mtime-newest so the file source delivers it after the
            # restored watermark has re-advanced), then (session only)
            # the far-future sentinel that flushes append-mode sessions
            for fpath in slices[split:]:
                os.link(fpath, os.path.join(src, os.path.basename(fpath)))
            probe_dst = os.path.join(src, "zz_late_probe.parquet")
            os.makedirs(os.path.dirname(probe_dst), exist_ok=True)
            shutil.copy(probe_src, probe_dst)
            t_new = os.path.getmtime(slices[-1])
            os.utime(probe_dst, (t_new + 60, t_new + 60))
            n_new = (n_slices - split) + 1
            if spec["sentinel"]:
                sentinel_dst = os.path.join(src, "zz_zz_sentinel.parquet")
                con.execute(
                    "COPY (SELECT 999999999::BIGINT AS event_id, "
                    f"TIMESTAMP '{far_ts}' AS ts, 5::BIGINT AS user_id, "
                    "'click' AS event_type, 1.0::DOUBLE AS value, "
                    "NULL::VARCHAR AS props) "
                    f"TO '{sentinel_dst}' (FORMAT PARQUET)"
                )
                os.utime(sentinel_dst, (t_new + 120, t_new + 120))
                n_new += 1
            p2 = phase()
            fed2 = [p for p in p2 if p.get("numInputRows", 0) > 0]
            wm2_first = wm_of(fed2[0]) if fed2 else ""
            dropped2 = sum(dropped_of(p) for p in p2)
            checks = {
                "watermark_restored": bool(
                    wm1 > "1971" and wm2_first and wm2_first >= wm1
                ),
                "late_probe_dropped": dropped2 > 0,
                "no_reprocessing": len(fed2) <= n_new + 2,
            }
            got = spec["recover"](spark.read.parquet(sink))
            if spec["oracle"] is not None:
                want = spec["oracle"]()
                checks["oracle_equal"] = got == want
                detail = {"rows": len(got), "oracle_rows": len(want)}
                if not checks["oracle_equal"]:
                    for a, b in [
                        (a, b) for a, b in zip(got, want) if a != b
                    ][:3]:
                        print(f"  got : {a}\n  want: {b}")
            else:
                err = spec["bounds"](got)
                checks["bounds_ok"] = err is None
                detail = {"rows": len(got)}
                if err:
                    print(f"  bounds: {err}")
            ok = all(checks.values())
            if not ok:
                failures += 1
            print(
                json.dumps(
                    {
                        "job": name,
                        "restart_ok": ok,
                        **checks,
                        **detail,
                        "phase1_watermark": wm1,
                        "phase2_first_watermark": wm2_first,
                        "phase2_dropped_by_watermark": dropped2,
                        "phase1_batches": len(
                            [p for p in p1 if p.get("numInputRows", 0) > 0]
                        ),
                        "phase2_batches": len(fed2),
                    }
                )
            )
        except Exception as exc:
            failures += 1
            msg = str(exc).splitlines()[0][:200]
            print(f"{name}: ERROR ({msg})")
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(
        f"\neviction-family restart certification k={k} "
        f"({split}+{n_slices - split} slices + late probe): "
        f"{len(JOBS) - failures}/{len(JOBS)} green"
    )
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    nums = [a for a in args if a.isdigit()]
    k = int(nums[0]) if nums else 20
    n_slices = int(nums[1]) if len(nums) > 1 else N_SLICES
    rest = [a for a in args if not a.isdigit()]
    if rest == ["--restart"]:
        sys.exit(1 if run_restart(k, n_slices) else 0)
    if rest == ["--restart-eviction"]:
        sys.exit(1 if run_restart_eviction(k, n_slices) else 0)
    if rest == ["--disorder"]:
        sys.exit(1 if run_disorder(k, n_slices) else 0)
    qs = rest or TWINS
    sys.exit(1 if run(k, n_slices, qs) else 0)
