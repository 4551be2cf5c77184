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
  trigger as real source offsets). Pass ``state_dir`` to persist the
  poll counter across restarts (committed offsets re-seed it);
  without it a restarted query re-polls from round 0 — at-least-once,
  which a scrape (idempotent read of the feed's current state)
  tolerates by design.

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

from transitdata_monitor_data_collector_spark.sources.gtfsrt import (
    SCRAPE_SCHEMA,
    classify_scrape,
)

__all__ = ["GtfsRtScrapeDataSource", "register"]

# derived from the mapInPandas pipeline's schema so the two formulations
# cannot drift
BATCH_SCHEMA = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in SCRAPE_SCHEMA.fields
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
    import urllib.error
    import urllib.request

    def fetch(url: str):
        # urlopen raises HTTPError (an OSError) for non-2xx — catching it
        # here keeps the http_<code> taxonomy arm alive; letting it
        # propagate would collapse every status into io_error
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    return fetch


def _make_fetcher(options: dict):
    if options.get("transport", "file") == "http":
        return _http_fetcher()
    return _file_fetcher(options["payload_dir"])


def _parse_urls(options: dict) -> list[str]:
    return [u.strip() for u in options["urls"].split(",") if u.strip()]


def _now(options: dict) -> int:
    """Clock for timestamp_age_seconds: the injected option when given
    (deterministic tests), else the REAL wall clock read per call — a
    long-running stream must age feeds against now, not query start."""
    import time

    v = options.get("now_epoch")
    return int(v) if v is not None else int(time.time())


def _validate(options: dict) -> None:
    """Driver-side option validation — missing options must fail at plan
    time with a named option, not as executor-task KeyErrors."""
    if not options.get("urls"):
        raise ValueError("gtfsrt_scrape: option 'urls' is required")
    transport = options.get("transport", "file")
    if transport == "file" and not options.get("payload_dir"):
        raise ValueError(
            "gtfsrt_scrape: option 'payload_dir' is required for the "
            "file transport"
        )
    if transport not in ("file", "http"):
        raise ValueError(
            f"gtfsrt_scrape: unknown transport {transport!r} "
            "(expected 'file' or 'http')"
        )


class _UrlPartition(InputPartition):
    def __init__(self, url: str, poll_id: int = 0):
        self.url = url
        self.poll_id = poll_id


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.urls = _parse_urls(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        fetch = _make_fetcher(self.options)
        yield (0, *classify_scrape(partition.url, fetch, _now(self.options)))


class _StreamReader(DataSourceStreamReader):
    """Offset = number of completed poll rounds. ``latestOffset`` advances
    one round per trigger up to ``max_polls`` (unbounded when 0) — the
    scheduled-polling loop expressed as source offsets. The counter is
    re-seeded from any engine-provided range (restart) and, when
    ``state_dir`` is set, persisted on commit so a restarted query
    continues from the committed round instead of round 0."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.urls = _parse_urls(options)
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
        # the RESTORED value, frozen at construction — the engine may
        # call latestOffset() before initialOffset(), and returning the
        # live counter would silently skip the first poll round
        return {"poll": self._initial}

    def latestOffset(self) -> dict:
        if self.max_polls == 0 or self._latest < self.max_polls:
            self._latest += 1
        return {"poll": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # restart safety: never plan behind an engine-restored range
        self._latest = max(self._latest, end["poll"])
        return [
            _UrlPartition(u, poll_id=p)
            for p in range(start["poll"], end["poll"])
            for u in self.urls
        ]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        fetch = _make_fetcher(self.options)
        row = classify_scrape(partition.url, fetch, _now(self.options))
        yield (partition.poll_id, *row)

    def commit(self, end: dict) -> None:
        if self._state_file:
            os.makedirs(os.path.dirname(self._state_file), exist_ok=True)
            tmp = self._state_file + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(end["poll"]))
            os.replace(tmp, self._state_file)

    def stop(self) -> None:
        pass


class GtfsRtScrapeDataSource(DataSource):
    """format("gtfsrt_scrape") — options:

    - ``urls``: comma-separated feed URLs (required; whitespace around
      commas is stripped)
    - ``payload_dir``: fixture directory for the file transport
    - ``transport``: ``file`` (default) or ``http``
    - ``now_epoch``: clock for timestamp_age_seconds (injectable time;
      defaults to the real wall clock read per poll)
    - ``max_polls``: streaming only — stop advancing offsets after N
      rounds (0 = unbounded)
    - ``state_dir``: streaming only — persist the poll counter so a
      restart continues from the committed round
    """

    @classmethod
    def name(cls) -> str:
        return "gtfsrt_scrape"

    def schema(self) -> str:
        # poll_id is 0 for batch reads, the poll-round index for streams
        return STREAM_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        _validate(self.options)
        return _BatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        _validate(self.options)
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GtfsRtScrapeDataSource)
