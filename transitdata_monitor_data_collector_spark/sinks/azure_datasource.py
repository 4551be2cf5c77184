"""Azure Monitor envelope posting as a Spark 4 Python DataSource WRITER —
``df.write.format("azure_monitor")`` / ``writeStream.format(...)``.

The foreachBatch sink (sinks/azure.py:AzureMonitorSink.for_each_batch)
stays the reference-shaped path (one envelope per batch, collected on the
driver — the reference POSTs one body per window,
mqtt_data_collector.py:236-253). This writer is the SCALE path for wide
metric fan-outs: every row is one pre-built envelope JSON
(``envelope_json`` column), posted FROM THE EXECUTORS partition-parallel,
with the engine's commit protocol doing the bookkeeping:

- ``write(iterator)`` posts each envelope via the configured transport
  and returns a commit message carrying (partition, n_posted);
- ``commit(messages, batch_id)`` records a batch marker — at-least-once
  across retries, same contract as the reference's retry bursts;
- ``abort`` leaves the spool untouched (failed tasks simply re-run).

Transports: ``spool`` (default — append-only JSONL per partition under
``spool_dir``; offline/test) or ``https`` (urllib POST to ``url``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

__all__ = ["AzureMonitorDataSource", "register"]


class _Posted(WriterCommitMessage):
    """Task -> driver commit message: where the task's pending file landed
    and how many envelopes it holds. Two-phase commit: tasks write to
    pending/, the driver's commit() publishes into epoch=<batchId>/."""

    def __init__(self, pending_path: str | None, n: int):
        self.pending_path = pending_path
        self.n = n


def _post_rows(options: dict, rows: Iterator) -> _Posted:
    import uuid

    from pyspark import TaskContext

    pid = TaskContext.get().partitionId() if TaskContext.get() else 0
    transport = options.get("transport", "spool")
    n = 0
    if transport == "spool":
        spool = options["spool_dir"]
        pending = os.path.join(spool, "pending")
        os.makedirs(pending, exist_ok=True)
        path = os.path.join(
            pending, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        )
        with open(path, "w") as f:
            for row in rows:
                f.write(row["envelope_json"].rstrip("\n") + "\n")
                n += 1
        return _Posted(path, n)
    # pragma: no cover - needs network
    import urllib.request

    url = options["url"]
    for row in rows:
        req = urllib.request.Request(
            url,
            data=row["envelope_json"].encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=10)
        n += 1
    return _Posted(None, n)


def _publish(options: dict, epoch: int, messages) -> None:
    """Driver-side commit: move each task's pending file under the epoch
    dir, then drop the _COMMIT marker — readers treat an epoch dir
    without a marker as in-flight."""
    if options.get("transport", "spool") != "spool":
        return
    spool = options["spool_dir"]
    out = os.path.join(spool, f"epoch={epoch}")
    os.makedirs(out, exist_ok=True)
    total = 0
    for m in messages:
        if m is None:
            continue
        total += m.n
        if m.pending_path and os.path.exists(m.pending_path):
            os.replace(
                m.pending_path,
                os.path.join(out, os.path.basename(m.pending_path)),
            )
    with open(os.path.join(out, "_COMMIT"), "w") as f:
        json.dump({"epoch": epoch, "envelopes": total}, f)


def _discard(options: dict, messages) -> None:
    if options.get("transport", "spool") != "spool":
        return
    for m in messages or []:
        if m is not None and m.pending_path and os.path.exists(m.pending_path):
            os.remove(m.pending_path)


class _BatchWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.options = dict(options)

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        return _post_rows(self.options, iterator)

    def commit(self, messages) -> None:
        _publish(self.options, 0, messages)

    def abort(self, messages) -> None:
        _discard(self.options, messages)


class _StreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.options = dict(options)

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        return _post_rows(self.options, iterator)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.options, batchId, messages)

    def abort(self, messages, batchId: int) -> None:
        _discard(self.options, messages)


class AzureMonitorDataSource(DataSource):
    """format("azure_monitor") — options: ``transport`` (spool|https),
    ``spool_dir`` (spool), ``url`` (https). Input rows must carry an
    ``envelope_json`` string column (build_envelope_df output)."""

    @classmethod
    def name(cls) -> str:
        return "azure_monitor"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _BatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _StreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(AzureMonitorDataSource)
