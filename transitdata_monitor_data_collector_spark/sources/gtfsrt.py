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
    "parse_feed_entities",
    "decode_feed_entities",
    "encode_feed_message",
    "encode_vehicle_entity",
    "encode_trip_update_entity",
    "classify_scrape",
    "scrape_feeds",
    "scrape_metrics",
    "SCRAPE_SCHEMA",
    "GTFS_ENTITY_SCHEMA",
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


# ---------------------------------------------------------------------------
# Full FeedEntity decode (public gtfs-realtime.proto field numbers).
# The reference only reads header+entity-count (GtfsRtMetricsExporter.java:60-63);
# this extends the same hand varint parser to the per-entity payload a transit
# analyst actually needs: vehicle positions (lat/lon/bearing/speed) and trip
# updates (route, delay, stop-time updates). No generated bindings required.
# ---------------------------------------------------------------------------


def _zigzag_free_int(v: int) -> int:
    """proto int32/int64 are plain varints of the 64-bit two's complement
    (NOT zigzag) — map the unsigned decode back to a signed value."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _f32(buf: bytes, pos: int) -> tuple[float, int]:
    import struct

    if pos + 4 > len(buf):
        raise FeedParseError("truncated float")
    return struct.unpack("<f", buf[pos : pos + 4])[0], pos + 4


def _f64(buf: bytes, pos: int) -> tuple[float, int]:
    import struct

    if pos + 8 > len(buf):
        raise FeedParseError("truncated double")
    return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8


def _iter_fields(buf: bytes):
    """Yield (fieldno, wire, value, raw_bytes) over a message body.

    value is the decoded varint for wire 0, the sub-message/string bytes for
    wire 2, and None for wire 1/5 (caller re-reads via raw_bytes)."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fieldno, wire = tag >> 3, tag & 0x7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield fieldno, wire, v, b""
        elif wire == 2:
            n, pos = _read_varint(buf, pos)
            if pos + n > len(buf):
                raise FeedParseError("truncated length-delimited field")
            yield fieldno, wire, buf[pos : pos + n], b""
            pos += n
        elif wire == 5:
            yield fieldno, wire, None, buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            yield fieldno, wire, None, buf[pos : pos + 8]
            pos += 8
        else:
            raise FeedParseError(f"unsupported wire type {wire}")


def _parse_trip_descriptor(buf: bytes) -> dict:
    # TripDescriptor{trip_id=1, start_time=2, start_date=3,
    #                schedule_relationship=4, route_id=5, direction_id=6}
    out = {"trip_id": None, "route_id": None, "start_date": None, "direction_id": None}
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 2:
            out["trip_id"] = v.decode("utf-8", "replace")
        elif fno == 3 and wire == 2:
            out["start_date"] = v.decode("utf-8", "replace")
        elif fno == 5 and wire == 2:
            out["route_id"] = v.decode("utf-8", "replace")
        elif fno == 6 and wire == 0:
            out["direction_id"] = v
    return out


def _parse_vehicle_descriptor(buf: bytes) -> dict:
    # VehicleDescriptor{id=1, label=2, license_plate=3}
    out = {"vehicle_id": None, "vehicle_label": None}
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 2:
            out["vehicle_id"] = v.decode("utf-8", "replace")
        elif fno == 2 and wire == 2:
            out["vehicle_label"] = v.decode("utf-8", "replace")
    return out


def _parse_position(buf: bytes) -> dict:
    # Position{latitude=1 float, longitude=2 float, bearing=3 float,
    #          odometer=4 double, speed=5 float}
    out = {"latitude": None, "longitude": None, "bearing": None, "speed": None}
    for fno, wire, _v, raw in _iter_fields(buf):
        if wire == 5:
            val, _ = _f32(raw, 0)
            if fno == 1:
                out["latitude"] = val
            elif fno == 2:
                out["longitude"] = val
            elif fno == 3:
                out["bearing"] = val
            elif fno == 5:
                out["speed"] = val
    return out


def _parse_stop_time_event(buf: bytes) -> dict:
    # StopTimeEvent{delay=1 int32, time=2 int64, uncertainty=3 int32}
    out = {"delay": None, "time": None}
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 0:
            out["delay"] = _zigzag_free_int(v)
        elif fno == 2 and wire == 0:
            out["time"] = _zigzag_free_int(v)
    return out


def _parse_stop_time_update(buf: bytes) -> dict:
    # StopTimeUpdate{stop_sequence=1, arrival=2, departure=3, stop_id=4}
    out = {
        "stop_sequence": None,
        "stop_id": None,
        "arrival_delay": None,
        "departure_delay": None,
    }
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 0:
            out["stop_sequence"] = v
        elif fno == 2 and wire == 2:
            out["arrival_delay"] = _parse_stop_time_event(v)["delay"]
        elif fno == 3 and wire == 2:
            out["departure_delay"] = _parse_stop_time_event(v)["delay"]
        elif fno == 4 and wire == 2:
            out["stop_id"] = v.decode("utf-8", "replace")
    return out


_ENTITY_NONE = {
    "trip_id": None,
    "route_id": None,
    "start_date": None,
    "direction_id": None,
    "vehicle_id": None,
    "vehicle_label": None,
    "latitude": None,
    "longitude": None,
    "bearing": None,
    "speed": None,
    "current_stop_sequence": None,
    "stop_id": None,
    "vp_timestamp": None,
    "tu_timestamp": None,
    "tu_delay": None,
    "stop_time_updates": None,
}


def _parse_trip_update(buf: bytes) -> dict:
    # TripUpdate{trip=1, stop_time_update=2 repeated, vehicle=3,
    #            timestamp=4 uint64, delay=5 int32}
    out = dict(_ENTITY_NONE)
    stus: list[dict] = []
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 2:
            out.update(_parse_trip_descriptor(v))
        elif fno == 2 and wire == 2:
            stus.append(_parse_stop_time_update(v))
        elif fno == 3 and wire == 2:
            out.update(_parse_vehicle_descriptor(v))
        elif fno == 4 and wire == 0:
            out["tu_timestamp"] = v
        elif fno == 5 and wire == 0:
            out["tu_delay"] = _zigzag_free_int(v)
    out["stop_time_updates"] = stus
    return out


def _parse_vehicle_position(buf: bytes) -> dict:
    # VehiclePosition{trip=1, position=2, current_stop_sequence=3,
    #                 current_status=4, timestamp=5, congestion_level=6,
    #                 stop_id=7, vehicle=8, occupancy_status=9}
    out = dict(_ENTITY_NONE)
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 2:
            out.update(_parse_trip_descriptor(v))
        elif fno == 2 and wire == 2:
            out.update(_parse_position(v))
        elif fno == 3 and wire == 0:
            out["current_stop_sequence"] = v
        elif fno == 5 and wire == 0:
            out["vp_timestamp"] = v
        elif fno == 7 and wire == 2:
            out["stop_id"] = v.decode("utf-8", "replace")
        elif fno == 8 and wire == 2:
            out.update(_parse_vehicle_descriptor(v))
    return out


def _parse_entity(buf: bytes) -> dict:
    # FeedEntity{id=1, is_deleted=2, trip_update=3, vehicle=4, alert=5}
    row = dict(_ENTITY_NONE)
    row.update({"entity_id": None, "is_deleted": False, "kind": "unknown"})
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 2:
            row["entity_id"] = v.decode("utf-8", "replace")
        elif fno == 2 and wire == 0:
            row["is_deleted"] = bool(v)
        elif fno == 3 and wire == 2:
            row.update(_parse_trip_update(v))
            row["kind"] = "trip_update"
        elif fno == 4 and wire == 2:
            row.update(_parse_vehicle_position(v))
            row["kind"] = "vehicle"
        elif fno == 5 and wire == 2:
            row["kind"] = "alert"
    return row


def parse_feed_entities(body: bytes) -> list[dict]:
    """Full FeedMessage decode: one flat dict per entity (vehicle position
    and trip update fields merged; the absent family stays None). Raises
    :class:`FeedParseError` on malformed bodies — same taxonomy hook as
    :func:`parse_feed_summary`."""
    if body is None:
        raise FeedParseError("empty body")
    buf = bytes(body)
    entities: list[dict] = []
    saw_known = False
    for fno, wire, v, _raw in _iter_fields(buf):
        if fno == 1 and wire == 2:
            saw_known = True  # header
        elif fno == 2 and wire == 2:
            entities.append(_parse_entity(v))
            saw_known = True
    if buf and not saw_known:
        raise FeedParseError("no FeedMessage fields found")
    return entities


GTFS_ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("entity_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("is_deleted", T.BooleanType(), True),
        T.StructField("trip_id", T.StringType(), True),
        T.StructField("route_id", T.StringType(), True),
        T.StructField("start_date", T.StringType(), True),
        T.StructField("direction_id", T.IntegerType(), True),
        T.StructField("vehicle_id", T.StringType(), True),
        T.StructField("vehicle_label", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("bearing", T.DoubleType(), True),
        T.StructField("speed", T.DoubleType(), True),
        T.StructField("current_stop_sequence", T.IntegerType(), True),
        T.StructField("stop_id", T.StringType(), True),
        T.StructField("vp_timestamp", T.LongType(), True),
        T.StructField("tu_timestamp", T.LongType(), True),
        T.StructField("tu_delay", T.IntegerType(), True),
        T.StructField(
            "stop_time_updates",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("stop_sequence", T.IntegerType(), True),
                        T.StructField("stop_id", T.StringType(), True),
                        T.StructField("arrival_delay", T.IntegerType(), True),
                        T.StructField("departure_delay", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def decode_feed_entities(df: DataFrame, body_col: str = "body", url_col: str = "url") -> DataFrame:
    """Explode stored feed bodies ``(url, body binary)`` into one typed row
    per FeedEntity (GTFS_ENTITY_SCHEMA). Arrow-batched ``mapInPandas`` —
    decode runs in executor tasks; a parse failure yields zero rows for that
    body (the scrape-outcome taxonomy already accounts for it upstream).

    This is the 100 TB path for a feed-body lake: partition by fetch date,
    decode per batch, aggregate relationally downstream."""
    import pandas as pd

    cols = [f.name for f in GTFS_ENTITY_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, body in zip(pdf[url_col], pdf[body_col]):
                try:
                    ents = parse_feed_entities(body)
                except FeedParseError:
                    continue
                for e in ents:
                    stus = e.get("stop_time_updates")
                    rows.append(
                        (
                            url,
                            e["entity_id"],
                            e["kind"],
                            e["is_deleted"],
                            e["trip_id"],
                            e["route_id"],
                            e["start_date"],
                            e["direction_id"],
                            e["vehicle_id"],
                            e["vehicle_label"],
                            e["latitude"],
                            e["longitude"],
                            e["bearing"],
                            e["speed"],
                            e["current_stop_sequence"],
                            e["stop_id"],
                            e["vp_timestamp"],
                            e["tu_timestamp"],
                            e["tu_delay"],
                            [
                                (
                                    s["stop_sequence"],
                                    s["stop_id"],
                                    s["arrival_delay"],
                                    s["departure_delay"],
                                )
                                for s in stus
                            ]
                            if stus is not None
                            else None,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols).astype(object)

    return df.select(url_col, body_col).mapInPandas(batches, GTFS_ENTITY_SCHEMA)


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


def _encode_signed(v: int) -> bytes:
    """proto int32/int64: negative values as 64-bit two's-complement varints."""
    return _encode_varint(v & 0xFFFFFFFFFFFFFFFF)


def _ld(fieldno: int, payload: bytes) -> bytes:
    """length-delimited field (wire 2)."""
    return _encode_varint((fieldno << 3) | 2) + _encode_varint(len(payload)) + payload


def _vi(fieldno: int, v: int) -> bytes:
    """varint field (wire 0)."""
    return _encode_varint(fieldno << 3) + _encode_varint(v)


def _f32le(fieldno: int, v: float) -> bytes:
    import struct

    return _encode_varint((fieldno << 3) | 5) + struct.pack("<f", v)


def _trip_descriptor(trip_id: str | None, route_id: str | None, start_date: str | None, direction_id: int | None) -> bytes:
    out = b""
    if trip_id is not None:
        out += _ld(1, trip_id.encode())
    if start_date is not None:
        out += _ld(3, start_date.encode())
    if route_id is not None:
        out += _ld(5, route_id.encode())
    if direction_id is not None:
        out += _vi(6, direction_id)
    return out


def encode_vehicle_entity(
    entity_id: str,
    *,
    trip_id: str | None = None,
    route_id: str | None = None,
    start_date: str | None = None,
    direction_id: int | None = None,
    vehicle_id: str | None = None,
    latitude: float | None = None,
    longitude: float | None = None,
    bearing: float | None = None,
    speed: float | None = None,
    stop_id: str | None = None,
    current_stop_sequence: int | None = None,
    timestamp: int | None = None,
) -> bytes:
    """FeedEntity payload carrying a VehiclePosition (fixture builder —
    mirrors GtfsRtMetricsExporterTest.java:327-337's proto builders)."""
    vp = b""
    td = _trip_descriptor(trip_id, route_id, start_date, direction_id)
    if td:
        vp += _ld(1, td)
    pos = b""
    if latitude is not None:
        pos += _f32le(1, latitude)
    if longitude is not None:
        pos += _f32le(2, longitude)
    if bearing is not None:
        pos += _f32le(3, bearing)
    if speed is not None:
        pos += _f32le(5, speed)
    if pos:
        vp += _ld(2, pos)
    if current_stop_sequence is not None:
        vp += _vi(3, current_stop_sequence)
    if timestamp is not None:
        vp += _vi(5, timestamp)
    if stop_id is not None:
        vp += _ld(7, stop_id.encode())
    if vehicle_id is not None:
        vp += _ld(8, _ld(1, vehicle_id.encode()))
    return _ld(1, entity_id.encode()) + _ld(4, vp)


def encode_trip_update_entity(
    entity_id: str,
    *,
    trip_id: str | None = None,
    route_id: str | None = None,
    start_date: str | None = None,
    direction_id: int | None = None,
    vehicle_id: str | None = None,
    delay: int | None = None,
    timestamp: int | None = None,
    stop_time_updates: Sequence[tuple[int, str, int | None, int | None]] = (),
) -> bytes:
    """FeedEntity payload carrying a TripUpdate; ``stop_time_updates`` rows
    are (stop_sequence, stop_id, arrival_delay, departure_delay)."""
    tu = b""
    td = _trip_descriptor(trip_id, route_id, start_date, direction_id)
    if td:
        tu += _ld(1, td)
    for seq, sid, arr, dep in stop_time_updates:
        stu = _vi(1, seq)
        if arr is not None:
            stu += _ld(2, _encode_varint(1 << 3) + _encode_signed(arr))
        if dep is not None:
            stu += _ld(3, _encode_varint(1 << 3) + _encode_signed(dep))
        stu += _ld(4, sid.encode())
        tu += _ld(2, stu)
    if vehicle_id is not None:
        tu += _ld(3, _ld(1, vehicle_id.encode()))
    if timestamp is not None:
        tu += _vi(4, timestamp)
    if delay is not None:
        tu += _encode_varint(5 << 3) + _encode_signed(delay)
    return _ld(1, entity_id.encode()) + _ld(3, tu)


def encode_feed_message(
    version: str = "2.0",
    timestamp: int = 0,
    entity_ids: Sequence[str] = (),
    entities: Sequence[bytes] = (),
) -> bytes:
    """Build a minimal, valid FeedMessage body (test fixture generator —
    the analog of the reference test's proto builders,
    GtfsRtMetricsExporterTest.java:327-337). ``entity_ids`` produces
    id-only entities; ``entities`` appends pre-built FeedEntity payloads
    from :func:`encode_vehicle_entity` / :func:`encode_trip_update_entity`."""
    vb = version.encode()
    header = b"\x0a" + _encode_varint(len(vb)) + vb  # field 1, wire 2
    header += b"\x18" + _encode_varint(timestamp)  # field 3, wire 0
    msg = b"\x0a" + _encode_varint(len(header)) + header
    for eid in entity_ids:
        eb = eid.encode()
        entity = b"\x0a" + _encode_varint(len(eb)) + eb  # FeedEntity.id = 1
        msg += b"\x12" + _encode_varint(len(entity)) + entity  # field 2
    for ent in entities:
        msg += _ld(2, ent)
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
