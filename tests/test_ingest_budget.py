"""Throughput anchor pinned as a test: BASELINE.md's >= 10,000 msg/s
streaming ingest budget (MqttTopicMonitorListener.java:29-37's
MAX_INFLIGHT sizing). Regressing below it would silently void the
reference-parity claim, so fail loudly here instead."""

from __future__ import annotations

import os
import time

import pytest

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
    t0 = time.monotonic()
    out = q.build(spark, SF01)
    n_out = out.count()
    elapsed = time.monotonic() - t0
    assert n_out > 0
    throughput = n_events / elapsed
    assert throughput >= 10_000, (
        f"streaming replay ingested {n_events} events in {elapsed:.2f}s = "
        f"{throughput:,.0f} msg/s — below the 10,000 msg/s budget"
    )
