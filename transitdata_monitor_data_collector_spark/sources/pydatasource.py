"""GTFS-RT scraping as a REAL Spark 4 Python DataSource (DataSource V2
Python API) — ``spark.read.format("gtfsrt_scrape")`` /
``spark.readStream.format("gtfsrt_scrape")``.

The reference polls its feed URLs on a schedule and classifies every
scrape into the exporter's outcome taxonomy
(GtfsRtMetricsExporter.java:49-78). The mapInPandas formulation
(sources/gtfsrt.py:scrape_feeds) already runs fetches on executors; this
module lifts the same logic into the first-class source API so the feed
registry participates in Spark's planning:

- **batch**: one InputPartition PER URL — fetches parallelize across
  executors and a failed feed fails only its own task;
- **streaming**: one offset PER POLL ROUND (the S5 scheduled-polling
  trigger as real source offsets) — exactly-once bookkeeping of poll
  rounds comes from the engine's offset log, not hand-rolled state.

Offline determinism: the fetcher resolves each URL to
``<payload_dir>/<md5(url)>.bin`` (encode_feed_message fixtures); a
missing file surfaces as ``io_error`` — the taxonomy's transport-failure
arm. A deployment swaps in urllib by passing ``transport=http``; the
reader must stay constructible from string options because it is
pickled to executors.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from transitdata_monitor_data_collector_spark.sources.gtfsrt import classify_scrape

__all__ = ["GtfsRtScrapeDataSource", "register"]

BATCH_SCHEMA = (
    "url string, result string, entity_count int, "
    "feed_timestamp long, timestamp_age_seconds long"
)
STREAM_SCHEMA = f"poll_id long, {BATCH_SCHEMA}"


def _file_fetcher(payload_dir: str):
    def fetch(url: str):
        fp = os.path.join(
            payload_dir, hashlib.md5(url.encode()).hexdigest() + ".bin"
        )
        if not os.path.exists(fp):
            raise OSError(f"no payload for {url}")
        with open(fp, "rb") as f:
            return 200, f.read()

    return fetch


def _http_fetcher():  # pragma: no cover - needs network
    import urllib.request

    def fetch(url: str):
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.read()

    return fetch


def _make_fetcher(options: dict):
    if options.get("transport", "file") == "http":
        return _http_fetcher()
    return _file_fetcher(options["payload_dir"])


class _UrlPartition(InputPartition):
    def __init__(self, url: str, poll_id: int = 0):
        self.url = url
        self.poll_id = poll_id


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.urls = [u for u in options["urls"].split(",") if u]
        self.now = int(options.get("now_epoch", 0))

    def partitions(self) -> Sequence[InputPartition]:
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        fetch = _make_fetcher(self.options)
        yield (0, *classify_scrape(partition.url, fetch, self.now))


class _StreamReader(DataSourceStreamReader):
    """Offset = number of completed poll rounds. ``latestOffset`` advances
    one round per trigger up to ``max_polls`` (unbounded when 0) — the
    scheduled-polling loop expressed as source offsets, so restart/replay
    bookkeeping rides the engine's offset log."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.urls = [u for u in options["urls"].split(",") if u]
        self.now = int(options.get("now_epoch", 0))
        self.max_polls = int(options.get("max_polls", 0))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def latestOffset(self) -> dict:
        if self.max_polls == 0 or self._latest < self.max_polls:
            self._latest += 1
        return {"poll": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            _UrlPartition(u, poll_id=p)
            for p in range(start["poll"], end["poll"])
            for u in self.urls
        ]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        fetch = _make_fetcher(self.options)
        row = classify_scrape(partition.url, fetch, self.now)
        yield (partition.poll_id, *row)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class GtfsRtScrapeDataSource(DataSource):
    """format("gtfsrt_scrape") — options:

    - ``urls``: comma-separated feed URLs (required)
    - ``payload_dir``: fixture directory for the file transport
    - ``transport``: ``file`` (default) or ``http``
    - ``now_epoch``: clock for timestamp_age_seconds (injectable time)
    - ``max_polls``: streaming only — stop advancing offsets after N
      rounds (0 = unbounded)
    """

    @classmethod
    def name(cls) -> str:
        return "gtfsrt_scrape"

    def schema(self) -> str:
        # poll_id is 0 for batch reads, the poll-round index for streams
        return STREAM_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GtfsRtScrapeDataSource)
