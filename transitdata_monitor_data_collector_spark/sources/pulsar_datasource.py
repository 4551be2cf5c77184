"""Pulsar admin REST polling as a REAL Spark 4 Python DataSource —
``spark.read.format("pulsar_admin")`` / ``spark.readStream.format("pulsar_admin")``.

Lifts the driver-side admin poll (sources/pulsar.py:read_topic_stats, the
reference's sequential loop ``src/pulsar_data_collector.py:71-77``) into
the first-class source API, the same shape as ``gtfsrt_scrape``
(sources/pydatasource.py):

- **batch**: one InputPartition PER TOPIC — stats fetches parallelize
  across executors; a failed topic yields a row with ``fetch_error`` set
  and NULL stats (the reference's ``is not None`` membership survives);
- **discovery**: ``discover=true`` runs the namespaces→topics catalog
  crawl (``src/stats_of_all_topics.sh:19-30``) at PLAN time, so the
  partition list is the discovered catalog;
- **streaming**: one offset PER POLL ROUND — the scheduled-polling
  trigger as real source offsets, with ``state_dir`` persistence and
  restart re-seeding identical to the gtfsrt source.

Rows carry the raw stats JSON; :func:`parsed_topic_stats` applies the
explicit permissive TOPIC_STATS_SCHEMA so the typed surface matches
``read_topic_stats`` exactly (one parse definition, no drift).

Offline determinism: the file transport resolves each admin URL to
``<payload_dir>/<md5(url)>.json``; a missing file is a fetch error, the
transport-failure arm. A deployment passes ``transport=http``.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["PulsarAdminDataSource", "parsed_topic_stats", "register"]

SCHEMA = "poll_id long, topic string, stats_json string, fetch_error string"


def _stats_url(admin_url: str, namespace: str, topic: str) -> str:
    return f"{admin_url}/admin/v2/persistent/{namespace}/{topic}/stats"


def _file_fetcher(payload_dir: str):
    def fetch(url: str) -> str:
        fp = os.path.join(
            payload_dir, hashlib.md5(url.encode()).hexdigest() + ".json"
        )
        with open(fp) as f:  # missing file -> OSError = transport failure
            return f.read()

    return fetch


def _http_fetcher():  # pragma: no cover - needs network
    from urllib.request import urlopen

    def fetch(url: str) -> str:
        with urlopen(url, timeout=60) as resp:
            return resp.read().decode("utf-8")

    return fetch


def _make_fetcher(options: dict):
    if options.get("transport", "file") == "http":
        return _http_fetcher()
    return _file_fetcher(options["payload_dir"])


def _topics(options: dict) -> list[str]:
    """The monitored registry: explicit ``topics`` (comma-separated
    ``namespace/topic`` entries) or the discovery crawl when
    ``discover=true``. Runs driver-side at plan time — the catalog is a
    dimension, its size is the partition count."""
    if options.get("discover", "false").lower() == "true":
        from transitdata_monitor_data_collector_spark.sources.pulsar import (
            discover_topics,
        )

        full = discover_topics(
            options["admin_url"],
            tenant=options.get("tenant", "public"),
            fetcher=_make_fetcher(options),
        )
        # crawl returns tenant/namespace/topic; stats URLs want ns-relative
        return [t.split("/", 1)[1] if "/" in t else t for t in full]
    return [t.strip() for t in options.get("topics", "").split(",") if t.strip()]


def _validate(options: dict) -> None:
    if not options.get("admin_url"):
        raise ValueError("pulsar_admin: option 'admin_url' is required")
    transport = options.get("transport", "file")
    if transport == "file" and not options.get("payload_dir"):
        raise ValueError(
            "pulsar_admin: option 'payload_dir' is required for the file transport"
        )
    if transport not in ("file", "http"):
        raise ValueError(
            f"pulsar_admin: unknown transport {transport!r} (expected 'file' or 'http')"
        )
    if options.get("discover", "false").lower() != "true" and not options.get(
        "topics"
    ):
        raise ValueError(
            "pulsar_admin: option 'topics' is required unless discover=true"
        )


class _TopicPartition(InputPartition):
    def __init__(self, topic: str, poll_id: int = 0):
        self.topic = topic
        self.poll_id = poll_id


def _fetch_row(options: dict, topic: str, poll_id: int) -> tuple:
    fetch = _make_fetcher(options)
    url = _stats_url(options["admin_url"], options.get("namespace", "public/default"), topic)
    try:
        return (poll_id, topic, fetch(url), None)
    except Exception as exc:  # transport failure: row survives, stats NULL
        return (poll_id, topic, None, f"{type(exc).__name__}: {exc}")


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.topics = _topics(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [_TopicPartition(t) for t in self.topics]

    def read(self, partition: _TopicPartition) -> Iterator[tuple]:
        yield _fetch_row(self.options, partition.topic, 0)


class _StreamReader(DataSourceStreamReader):
    """Offset = completed poll rounds (same contract as the gtfsrt_scrape
    stream reader: restored initialOffset frozen at construction, restart
    re-seeding in partitions(), atomic state-file commit)."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.topics = _topics(options)
        self.max_polls = int(options.get("max_polls", 0))
        self._state_file = (
            os.path.join(options["state_dir"], "poll_offset")
            if options.get("state_dir")
            else None
        )
        self._initial = self._restore()
        self._latest = self._initial

    def _restore(self) -> int:
        if self._state_file and os.path.exists(self._state_file):
            try:
                with open(self._state_file) as f:
                    return int(f.read().strip() or 0)
            except (OSError, ValueError):
                return 0
        return 0

    def initialOffset(self) -> dict:
        return {"poll": self._initial}

    def latestOffset(self) -> dict:
        if self.max_polls == 0 or self._latest < self.max_polls:
            self._latest += 1
        return {"poll": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._latest = max(self._latest, end["poll"])
        return [
            _TopicPartition(t, poll_id=p)
            for p in range(start["poll"], end["poll"])
            for t in self.topics
        ]

    def read(self, partition: _TopicPartition) -> Iterator[tuple]:
        yield _fetch_row(self.options, partition.topic, partition.poll_id)

    def commit(self, end: dict) -> None:
        if self._state_file:
            os.makedirs(os.path.dirname(self._state_file), exist_ok=True)
            tmp = self._state_file + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(end["poll"]))
            os.replace(tmp, self._state_file)

    def stop(self) -> None:
        pass


class PulsarAdminDataSource(DataSource):
    """format("pulsar_admin") — options:

    - ``admin_url``: Pulsar admin REST base URL (required)
    - ``namespace``: stats namespace (default ``public/default``)
    - ``topics``: comma-separated topic registry (required unless
      ``discover=true``)
    - ``discover``: ``true`` runs the namespaces→topics crawl at plan time
      (``tenant`` selects the tenant, default ``public``)
    - ``transport``: ``file`` (default; fixtures at
      ``<payload_dir>/<md5(url)>.json``) or ``http``
    - ``max_polls`` / ``state_dir``: streaming poll-round control and
      restart persistence (same contract as gtfsrt_scrape)
    """

    @classmethod
    def name(cls) -> str:
        return "pulsar_admin"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        _validate(self.options)
        return _BatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        _validate(self.options)
        return _StreamReader(self.options)


def parsed_topic_stats(df: DataFrame) -> DataFrame:
    """Apply the typed stats parse to raw source rows — output columns
    match :func:`sources.pulsar.read_topic_stats` (plus poll_id and
    fetch_error), so every downstream query (big-backlog, envelopes) runs
    unchanged on either formulation."""
    from transitdata_monitor_data_collector_spark.sources.pulsar import (
        TOPIC_STATS_SCHEMA,
    )

    parsed = df.withColumn(
        "stats",
        F.from_json(
            "stats_json",
            TOPIC_STATS_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    return parsed.select(
        "poll_id",
        "topic",
        F.col("stats.msgRateIn").alias("msgRateIn"),
        F.col("stats.msgRateOut").alias("msgRateOut"),
        F.col("stats.storageSize").alias("storageSize"),
        F.col("stats.backlogSize").alias("backlogSize"),
        F.col("stats.subscriptions").alias("subscriptions"),
        F.col("stats._corrupt_record").alias("_corrupt_record"),
        "fetch_error",
    )


def register(spark) -> None:
    spark.dataSource.register(PulsarAdminDataSource)
