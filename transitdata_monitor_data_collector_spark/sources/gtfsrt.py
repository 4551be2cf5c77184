"""GTFS-RT feed scraping: fetch → classify → decode → metrics.

Re-expresses the reference's scheduled protobuf scrape
(``transitdata-metrics-exporter/.../gtfsrt/GtfsRtMetricsExporter.java:49-78``
and the one-shot Python variant ``src/gtfsrt_data_collector.py:17-25``) as a
batch DataFrame pipeline: a small URL dimension table is fetched (driver- or
executor-side via an injectable fetcher), each body is decoded with a
self-contained protobuf *wire-format* parser (no generated bindings needed —
only ``FeedMessage.header.{gtfs_realtime_version,timestamp}`` and the
``entity`` repetition count are read, exactly what the reference uses), and
scrape outcomes are classified with the exporter's exact error taxonomy:

``success`` | ``http_<code>`` | ``parse_error`` | ``io_error`` |
``unknown_error``  (GtfsRtMetricsExporter.java:54-77)

Scale note: the URL registry is tiny (a dimension), so fetching happens per
row inside ``mapInPandas`` — one HTTP call per task row, Arrow-batched; the
downstream aggregation (per-url distribution summary) is a plain
partial+final hash aggregate. At 100 TB this pattern generalizes to *stored*
feed bodies: a parquet lake of ``(url, fetch_ts, status, body)`` decoded by
the same UDF.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "FeedSummary",
    "FeedParseError",
    "parse_feed_summary",
    "encode_feed_message",
    "classify_scrape",
    "scrape_feeds",
    "scrape_metrics",
    "SCRAPE_SCHEMA",
]


# ---------------------------------------------------------------------------
# Protobuf wire-format parsing (public GTFS-Realtime schema, gtfs-realtime.proto:
# FeedMessage{header=1, entity=2 repeated};
# FeedHeader{gtfs_realtime_version=1, incrementality=2, timestamp=3})
# ---------------------------------------------------------------------------


class FeedParseError(ValueError):
    """Malformed protobuf body (InvalidProtocolBufferException analog)."""


@dataclass(frozen=True)
class FeedSummary:
    gtfs_realtime_version: str
    timestamp: int
    entity_count: int


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise FeedParseError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise FeedParseError("varint too long")


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:  # varint
        _, pos = _read_varint(buf, pos)
        return pos
    if wire_type == 1:  # 64-bit
        return pos + 8
    if wire_type == 2:  # length-delimited
        n, pos = _read_varint(buf, pos)
        if pos + n > len(buf):
            raise FeedParseError("truncated length-delimited field")
        return pos + n
    if wire_type == 5:  # 32-bit
        return pos + 4
    raise FeedParseError(f"unsupported wire type {wire_type}")


def _parse_header(buf: bytes) -> tuple[str, int]:
    version = ""
    timestamp = 0
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fieldno, wire = tag >> 3, tag & 0x7
        if fieldno == 1 and wire == 2:  # gtfs_realtime_version
            n, pos = _read_varint(buf, pos)
            version = buf[pos : pos + n].decode("utf-8", "replace")
            pos += n
        elif fieldno == 3 and wire == 0:  # timestamp (uint64)
            timestamp, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wire)
    return version, timestamp


def parse_feed_summary(body: bytes) -> FeedSummary:
    """Decode the FeedMessage fields the monitor needs: header version,
    header timestamp, entity count (GtfsRtMetricsExporter.java:60-63)."""
    if body is None:
        raise FeedParseError("empty body")
    version = ""
    timestamp = 0
    entities = 0
    saw_known_field = False
    pos = 0
    buf = bytes(body)
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fieldno, wire = tag >> 3, tag & 0x7
        if fieldno == 1 and wire == 2:  # header: FeedHeader
            n, pos = _read_varint(buf, pos)
            if pos + n > len(buf):
                raise FeedParseError("truncated header")
            version, timestamp = _parse_header(buf[pos : pos + n])
            saw_known_field = True
            pos += n
        elif fieldno == 2 and wire == 2:  # entity: repeated FeedEntity
            n, pos = _read_varint(buf, pos)
            if pos + n > len(buf):
                raise FeedParseError("truncated entity")
            entities += 1
            saw_known_field = True
            pos += n
        else:
            pos = _skip_field(buf, pos, wire)
    if buf and not saw_known_field:
        # Bytes that decode to zero known fields are treated as garbage —
        # mirrors proto parse failure on e.g. text bodies. (An empty-string
        # version or zero timestamp inside a REAL header field is valid.)
        raise FeedParseError("no FeedMessage fields found")
    return FeedSummary(version, timestamp, entities)


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_feed_message(
    version: str = "2.0",
    timestamp: int = 0,
    entity_ids: Sequence[str] = (),
) -> bytes:
    """Build a minimal, valid FeedMessage body (test fixture generator —
    the analog of the reference test's proto builders,
    GtfsRtMetricsExporterTest.java:327-337)."""
    vb = version.encode()
    header = b"\x0a" + _encode_varint(len(vb)) + vb  # field 1, wire 2
    header += b"\x18" + _encode_varint(timestamp)  # field 3, wire 0
    msg = b"\x0a" + _encode_varint(len(header)) + header
    for eid in entity_ids:
        eb = eid.encode()
        entity = b"\x0a" + _encode_varint(len(eb)) + eb  # FeedEntity.id = 1
        msg += b"\x12" + _encode_varint(len(entity)) + entity  # field 2
    return msg


# ---------------------------------------------------------------------------
# Scrape classification + pipeline
# ---------------------------------------------------------------------------

SCRAPE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("result", T.StringType(), False),
        T.StructField("entity_count", T.IntegerType(), True),
        T.StructField("feed_timestamp", T.LongType(), True),
        T.StructField("timestamp_age_seconds", T.LongType(), True),
    ]
)

Fetcher = Callable[[str], tuple[int, bytes]]
"""url -> (http_status, body). Raises OSError for transport failures."""


def classify_scrape(
    url: str, fetcher: Fetcher, now_epoch: int
) -> tuple[str, str, int | None, int | None, int | None]:
    """One scrape with the exporter's exact outcome taxonomy
    (GtfsRtMetricsExporter.java:49-78). Returns a SCRAPE_SCHEMA row."""
    try:
        status, body = fetcher(url)
        if status != 200:
            return (url, f"http_{status}", None, None, None)
        try:
            summary = parse_feed_summary(body)
        except FeedParseError:
            return (url, "parse_error", None, None, None)
        age = now_epoch - summary.timestamp
        return (url, "success", summary.entity_count, summary.timestamp, age)
    except OSError:
        return (url, "io_error", None, None, None)
    except Exception:
        return (url, "unknown_error", None, None, None)


def scrape_feeds(
    spark: SparkSession,
    urls: Sequence[str],
    fetcher: Fetcher,
    now_epoch: int,
) -> DataFrame:
    """Scrape every URL (the registry is a small dimension — one Arrow
    batch; each row is fetched inside ``mapInPandas`` so fetches run in
    executor tasks, not the driver)."""
    import pandas as pd

    urls_df = spark.createDataFrame(
        [(u,) for u in urls], T.StructType([T.StructField("url", T.StringType())])
    )

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [classify_scrape(u, fetcher, now_epoch) for u in pdf["url"]]
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCRAPE_SCHEMA.fields]
            ).astype(object)

    return urls_df.mapInPandas(fetch_batches, SCRAPE_SCHEMA)


def scrape_metrics(scrapes: DataFrame) -> dict[str, DataFrame]:
    """Aggregate scrape rows into the reference's meter set
    (GtfsRtMetricsRegistry.java:25-66):

    - ``gtfsrt_entity_count`` / ``gtfsrt_timestamp_age_seconds``:
      DistributionSummary = (count, sum, max) per url over successes;
    - ``gtfsrt_last_scrape_success``: 1/0 gauge per url (last by order);
    - ``gtfsrt_scrape_attempts_total``: counter per (url, result).
    """
    ok = scrapes.filter(F.col("result") == "success")
    summaries = ok.groupBy("url").agg(
        F.count("entity_count").alias("entity_count_count"),
        F.sum("entity_count").alias("entity_count_sum"),
        F.max("entity_count").alias("entity_count_max"),
        F.count("timestamp_age_seconds").alias("timestamp_age_count"),
        F.sum("timestamp_age_seconds").alias("timestamp_age_sum"),
        F.max("timestamp_age_seconds").alias("timestamp_age_max"),
    )
    attempts = scrapes.groupBy("url", "result").agg(
        F.count("*").alias("attempts_total")
    )
    # monotonically_increasing_id preserves scrape order within the batch —
    # the gauge is "the LAST scrape's success" (GtfsRtMetricsRegistry.java:51,56)
    ordered = scrapes.withColumn("_seq", F.monotonically_increasing_id())
    gauge = ordered.groupBy("url").agg(
        F.max_by((F.col("result") == "success").cast("int"), F.col("_seq")).alias(
            "last_scrape_success"
        )
    )
    return {
        "gtfsrt_summaries": summaries,
        "gtfsrt_scrape_attempts_total": attempts,
        "gtfsrt_last_scrape_success": gauge,
    }


def scheduled_scrape_stream(
    spark: SparkSession,
    urls: Sequence[str],
    fetcher: Fetcher,
    poll_interval: str = "30 seconds",
    queryName: str | None = None,
    checkpoint_dir: str | None = None,
):
    """S5: the fixed-rate scrape schedule (scheduleAtFixedRate with
    pollInterval PT30S, GtfsRtMetricsExporter.java:37-42,
    application.conf:4) as a Structured Streaming job: a ``rate`` ticker
    with one row per interval drives a ``foreachBatch`` that scrapes every
    URL and appends SCRAPE_SCHEMA rows to an in-memory table named
    ``queryName`` (readable while running — the serving view).

    Returns the started StreamingQuery; callers own stop(). Poll interval
    validation (must exceed the client timeout) lives in config.py.
    """
    import tempfile
    import time as _time
    import uuid

    name = queryName or f"gtfsrt_scrapes_{uuid.uuid4().hex[:8]}"
    ticker = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
    )
    # bounded history: a long-running poller would otherwise grow driver
    # memory forever; keep the most recent window (the reference keeps
    # only in-memory Micrometer state, i.e. effectively the latest)
    max_kept = 10_000
    results: list = []

    def scrape_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        now = int(_time.time())
        rows = [classify_scrape(u, fetcher, now) for u in urls]
        spark.createDataFrame(rows, SCRAPE_SCHEMA).createOrReplaceTempView(
            f"{name}_latest"
        )
        results.extend(rows)
        if len(results) > max_kept:
            del results[: len(results) - max_kept]

    interval_secs = poll_interval  # spark trigger grammar matches ours
    q = (
        ticker.writeStream.trigger(processingTime=interval_secs)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_scrape_"),
        )
        .foreachBatch(scrape_batch)
        .queryName(name)
        .start()
    )
    q._scrape_results = results  # test/introspection hook
    return q


def gtfsrt_metric_envelopes(scrapes: DataFrame, time_str: str) -> dict[str, DataFrame]:
    """The Python collector's Azure flow (gtfsrt_data_collector.py:28-53,
    56-64): for each successful scrape, one envelope PER (url, metric) —
    namespace ``GTFSRT``, single dimension ``URL``, single-element series
    (unlike the Pulsar flow's one-envelope-per-metric with a multi-row
    series). Returns {"Entity Count": df, "Timestamp Age": df}, each with
    (url, envelope_json) rows. Values keep their integer types — the
    reference serializes raw ints.
    """
    ok = scrapes.filter(F.col("result") == "success")

    def envelopes(metric: str, value_col: str) -> DataFrame:
        return ok.select(
            "url",
            F.to_json(
                F.struct(
                    F.lit(time_str).alias("time"),
                    F.struct(
                        F.struct(
                            F.lit(metric).alias("metric"),
                            F.lit("GTFSRT").alias("namespace"),
                            F.array(F.lit("URL")).alias("dimNames"),
                            F.array(
                                F.struct(
                                    F.array(F.col("url")).alias("dimValues"),
                                    F.col(value_col).alias("sum"),
                                    F.lit(1).alias("count"),
                                )
                            ).alias("series"),
                        ).alias("baseData")
                    ).alias("data"),
                )
            ).alias("envelope_json"),
        )

    return {
        "Entity Count": envelopes("Entity Count", "entity_count"),
        "Timestamp Age": envelopes("Timestamp Age", "timestamp_age_seconds"),
    }
