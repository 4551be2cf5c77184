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
- ``commit(messages, batch_id)`` publishes the batch's pending files
  under an epoch dir and drops a ``_COMMIT`` marker LAST — readers
  treat a marker-less epoch dir as in-flight, a replayed epoch whose
  marker already exists is discarded (exactly-once publish), and
  orphaned files from a crashed earlier attempt are cleared before the
  re-publish so the marker's count always equals the dir's rows;
- ``abort`` DISCARDS the failed attempt's pending files (the retried
  task spools fresh ones — nothing to inspect is nothing to double-post).

Transports: ``spool`` (default — append-only JSONL per partition under
``spool_dir``; offline/test) or ``https`` (urllib POST to ``url`` with
optional bearer auth and the reference's bounded retry burst).
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
    import time  # pragma: no cover - https transport needs network
    import urllib.request  # pragma: no cover

    url = options["url"]  # pragma: no cover
    headers = {"Content-Type": "application/json"}  # pragma: no cover
    token = options.get("bearer_token")  # pragma: no cover
    token_file = options.get("token_file")  # pragma: no cover
    if token is None and token_file:  # pragma: no cover
        with open(token_file) as f:
            token = f.read().strip()
    if token:  # pragma: no cover
        headers["Authorization"] = f"Bearer {token}"
    attempts = int(options.get("retries", "3"))  # pragma: no cover
    for row in rows:  # pragma: no cover
        req = urllib.request.Request(
            url, data=row["envelope_json"].encode(), headers=headers
        )
        # the reference's bounded retry burst (mqtt_data_collector.py
        # retries the POST with backoff before giving the row up to the
        # engine's task retry)
        for attempt in range(attempts):
            try:
                urllib.request.urlopen(req, timeout=10)
                break
            except Exception:
                if attempt == attempts - 1:
                    raise
                time.sleep(2**attempt)
        n += 1
    return _Posted(None, n)  # pragma: no cover


def _epochs(spool: str) -> list[int]:
    if not os.path.isdir(spool):
        return []
    out = []
    for name in os.listdir(spool):
        if name.startswith("epoch="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def _publish(options: dict, epoch: int, messages) -> None:
    """Driver-side commit: move each task's pending file under the epoch
    dir, then drop the _COMMIT marker LAST. Idempotent under replay:
    an already-committed epoch discards the redelivered files, and a
    marker-less dir left by a crashed attempt is cleared before the
    re-publish (its orphans were never committed)."""
    if options.get("transport", "spool") != "spool":
        return
    spool = options["spool_dir"]
    out = os.path.join(spool, f"epoch={epoch}")
    marker = os.path.join(out, "_COMMIT")
    if os.path.exists(marker):
        # replayed, already-committed epoch: exactly-once publish
        _discard(options, messages)
        return
    if os.path.isdir(out):
        for name in os.listdir(out):  # orphans of a crashed attempt
            os.remove(os.path.join(out, name))
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
    with open(marker, "w") as f:
        json.dump({"epoch": epoch, "envelopes": total}, f)


def _discard(options: dict, messages) -> None:
    if options.get("transport", "spool") != "spool":
        return
    for m in messages or []:
        if m is not None and m.pending_path and os.path.exists(m.pending_path):
            os.remove(m.pending_path)


def _validate(options: dict) -> None:
    """Driver-side option validation — a missing required option must
    fail the write before any task launches, not as a KeyError inside
    executor retries."""
    transport = options.get("transport", "spool")
    if transport == "spool":
        if not options.get("spool_dir"):
            raise ValueError(
                "azure_monitor: option 'spool_dir' is required for the "
                "spool transport"
            )
    elif transport == "https":
        if not options.get("url"):
            raise ValueError(
                "azure_monitor: option 'url' is required for the https "
                "transport"
            )
    else:
        raise ValueError(
            f"azure_monitor: unknown transport {transport!r} "
            "(expected 'spool' or 'https')"
        )


class _BatchWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.options = dict(options)
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        return _post_rows(self.options, iterator)

    def commit(self, messages) -> None:
        # batch writes are epoch-numbered too: each save() publishes the
        # NEXT epoch (overwrite clears the spool's history first), so
        # repeated batch writes never mix files under one marker
        if self.options.get("transport", "spool") == "spool":
            import shutil

            spool = self.options["spool_dir"]
            existing = _epochs(spool)
            if self.overwrite:
                for e in existing:
                    shutil.rmtree(
                        os.path.join(spool, f"epoch={e}"),
                        ignore_errors=True,
                    )
                existing = []
            epoch = (existing[-1] + 1) if existing else 0
        else:
            epoch = 0
        _publish(self.options, epoch, messages)

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
    ``spool_dir`` (spool), ``url``/``bearer_token``/``token_file``/
    ``retries`` (https). Input rows must carry an ``envelope_json``
    string column (build_envelope_df output)."""

    @classmethod
    def name(cls) -> str:
        return "azure_monitor"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        _validate(self.options)
        return _BatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        _validate(self.options)
        return _StreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(AzureMonitorDataSource)
