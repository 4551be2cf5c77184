"""Azure Monitor Python DataSource writer: two-phase commit (pending ->
epoch publish), batch + streaming epochs, envelope passthrough."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.sinks.azure_datasource import (
    AzureMonitorDataSource,
    register,
)


def test_batch_write_publishes_committed_epoch(spark, tmp_path):
    register(spark)
    spool = str(tmp_path / "spool")
    df = spark.createDataFrame(
        [(json.dumps({"metric": "m", "v": i}),) for i in range(5)],
        "envelope_json string",
    ).repartition(2)
    df.write.format("azure_monitor").option("spool_dir", spool).mode(
        "append"
    ).save()
    commit = json.load(open(os.path.join(spool, "epoch=0", "_COMMIT")))
    assert commit["envelopes"] == 5
    lines = []
    for fp in glob.glob(os.path.join(spool, "epoch=0", "*.jsonl")):
        lines += [json.loads(ln) for ln in open(fp)]
    assert sorted(d["v"] for d in lines) == [0, 1, 2, 3, 4]
    assert glob.glob(os.path.join(spool, "pending", "*")) == []


def test_stream_write_commits_per_epoch(spark, tmp_path):
    register(spark)
    spool = str(tmp_path / "sspool")
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .select(F.to_json(F.struct("value")).alias("envelope_json"))
    )
    q = (
        stream.writeStream.format("azure_monitor")
        .option("spool_dir", spool)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if len(glob.glob(os.path.join(spool, "epoch=*", "_COMMIT"))) >= 2:
            break
        time.sleep(0.5)
    q.stop()
    commits = glob.glob(os.path.join(spool, "epoch=*", "_COMMIT"))
    assert len(commits) >= 2
    # every committed epoch's marker matches the rows actually published
    for c in commits:
        meta = json.load(open(c))
        n_rows = sum(
            1
            for fp in glob.glob(os.path.join(os.path.dirname(c), "*.jsonl"))
            for _ in open(fp)
        )
        assert n_rows == meta["envelopes"]
    # stop() can interrupt an in-flight epoch BEFORE its driver-side
    # commit/abort runs; that epoch's spooled task files stay in pending/
    # as crash debris — the 2PC invariant is only that no committed epoch
    # references them (readers never observe uncommitted data), not that
    # an interrupted writer leaves zero residue.
    published = {
        os.path.basename(fp)
        for fp in glob.glob(os.path.join(spool, "epoch=*", "*.jsonl"))
    }
    for orphan in glob.glob(os.path.join(spool, "pending", "*")):
        assert os.path.basename(orphan) not in published


def test_source_name():
    assert AzureMonitorDataSource.name() == "azure_monitor"


def test_batch_writes_get_distinct_epochs(spark, tmp_path):
    """Repeated batch saves must not mix files under one marker: each
    save publishes the NEXT epoch; overwrite clears history first."""
    register(spark)
    envelope_df = spark.createDataFrame(
        [(json.dumps({"metric": "m", "v": i}),) for i in range(5)],
        "envelope_json string",
    ).repartition(2)
    spool = str(tmp_path / "spool_epochs")
    for _ in range(2):
        envelope_df.write.format("azure_monitor").option(
            "spool_dir", spool
        ).mode("append").save()
    epochs = sorted(
        d for d in os.listdir(spool) if d.startswith("epoch=")
    )
    assert epochs == ["epoch=0", "epoch=1"]
    n_rows = envelope_df.count()
    for e in epochs:
        with open(os.path.join(spool, e, "_COMMIT")) as f:
            meta = json.load(f)
        n_lines = sum(
            sum(1 for _ in open(os.path.join(spool, e, p)))
            for p in os.listdir(os.path.join(spool, e))
            if p.endswith(".jsonl")
        )
        assert meta["envelopes"] == n_lines == n_rows

    # overwrite drops the history and restarts at epoch 0
    envelope_df.write.format("azure_monitor").option(
        "spool_dir", spool
    ).mode("overwrite").save()
    assert sorted(
        d for d in os.listdir(spool) if d.startswith("epoch=")
    ) == ["epoch=0"]


def test_missing_required_option_fails_on_driver(spark):
    import pytest

    register(spark)
    envelope_df = spark.createDataFrame(
        [("{}",)], "envelope_json string"
    )
    with pytest.raises(Exception, match="spool_dir"):
        envelope_df.write.format("azure_monitor").mode("append").save()
