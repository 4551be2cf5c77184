"""GTFS-RT scrape pipeline tests — ports the reference's classification
matrix (GtfsRtMetricsExporterTest.java:84-325) and the Micrometer summary
semantics (GtfsRtMetricsRegistryTest.java:204-286) onto the DataFrame
pipeline; plus round-trips of the wire-format parser against hand-encoded
protobuf bytes (the analog of the test-built FeedMessage protos,
GtfsRtMetricsExporterTest.java:327-337)."""

from __future__ import annotations

import pytest

from transitdata_monitor_data_collector_spark.sources.gtfsrt import (
    FeedParseError,
    classify_scrape,
    encode_feed_message,
    parse_feed_summary,
    scrape_feeds,
    scrape_metrics,
)

NOW = 1_700_000_000
URL = "https://example.com/gtfsrt"


# ---------------------------------------------------------------------------
# Wire parser
# ---------------------------------------------------------------------------


def test_parse_round_trip():
    body = encode_feed_message("2.0", NOW - 30, ["e1", "e2", "e3"])
    s = parse_feed_summary(body)
    assert s.gtfs_realtime_version == "2.0"
    assert s.timestamp == NOW - 30
    assert s.entity_count == 3


def test_parse_empty_feed():
    body = encode_feed_message("1.0", 0, [])
    s = parse_feed_summary(body)
    assert s.entity_count == 0


def test_parse_large_varint_timestamp():
    body = encode_feed_message("2.0", 2**40, ["x"])
    assert parse_feed_summary(body).timestamp == 2**40


def test_parse_garbage_raises():
    with pytest.raises(FeedParseError):
        parse_feed_summary(b"this is not a protobuf message at all")


def test_parse_truncated_raises():
    body = encode_feed_message("2.0", NOW, ["entity-1"])
    with pytest.raises(FeedParseError):
        parse_feed_summary(body[: len(body) - 3])


# ---------------------------------------------------------------------------
# Classification matrix (GtfsRtMetricsExporterTest.java:84-325)
# ---------------------------------------------------------------------------


def fetch_ok(url):
    return 200, encode_feed_message("2.0", NOW - 100, ["a", "b"])


def test_success_records_entity_count_and_age():
    row = classify_scrape(URL, fetch_ok, NOW)
    assert row == (URL, "success", 2, NOW - 100, 100)


@pytest.mark.parametrize("status", [404, 500, 503])
def test_http_error_codes_tracked_separately(status):
    row = classify_scrape(URL, lambda u: (status, b""), NOW)
    assert row[1] == f"http_{status}"
    assert row[2] is None


def test_bad_protobuf_is_parse_error():
    row = classify_scrape(URL, lambda u: (200, b"garbage garbage bytes"), NOW)
    assert row[1] == "parse_error"


def test_io_error():
    def boom(url):
        raise OSError("connection reset")

    assert classify_scrape(URL, boom, NOW)[1] == "io_error"


def test_unknown_error():
    def boom(url):
        raise RuntimeError("surprise")

    assert classify_scrape(URL, boom, NOW)[1] == "unknown_error"


# ---------------------------------------------------------------------------
# DataFrame pipeline + summary semantics (GtfsRtMetricsRegistryTest.java)
# ---------------------------------------------------------------------------


def test_scrape_feeds_dataframe(spark):
    urls = [URL, "https://example.com/other"]

    def fetcher(url):
        if url == URL:
            return 200, encode_feed_message("2.0", NOW - 50, ["x"])
        return 503, b""

    df = scrape_feeds(spark, urls, fetcher, NOW)
    rows = {r["url"]: r for r in df.collect()}
    assert rows[URL]["result"] == "success"
    assert rows[URL]["entity_count"] == 1
    assert rows[URL]["timestamp_age_seconds"] == 50
    assert rows["https://example.com/other"]["result"] == "http_503"


def test_summary_count_sum_max(spark):
    # Mirrors GtfsRtMetricsRegistryTest.java:204-224: recording 100, 120,
    # 150 gives count=3, total=370, max=150.
    calls = iter([100, 120, 150])

    def fetcher(url):
        n = next(calls)
        return 200, encode_feed_message("2.0", NOW - n, [str(i) for i in range(n)])

    rows = []
    for _ in range(3):
        rows.append(classify_scrape(URL, fetcher, NOW))
    df = spark.createDataFrame(
        rows, "url string, result string, entity_count int, "
        "feed_timestamp long, timestamp_age_seconds long"
    )
    m = scrape_metrics(df)
    s = m["gtfsrt_summaries"].collect()[0]
    assert s["entity_count_count"] == 3
    assert s["entity_count_sum"] == 370
    assert s["entity_count_max"] == 150
    assert s["timestamp_age_sum"] == 370
    assert s["timestamp_age_max"] == 150


def test_counters_tagged_separately_and_gauge_last_wins(spark):
    rows = [
        (URL, "success", 1, NOW, 0),
        (URL, "http_500", None, None, None),
        (URL, "http_500", None, None, None),
        (URL, "parse_error", None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, result string, entity_count int, "
        "feed_timestamp long, timestamp_age_seconds long"
    )
    m = scrape_metrics(df)
    attempts = {
        (r["url"], r["result"]): r["attempts_total"]
        for r in m["gtfsrt_scrape_attempts_total"].collect()
    }
    assert attempts[(URL, "success")] == 1
    assert attempts[(URL, "http_500")] == 2
    assert attempts[(URL, "parse_error")] == 1
    gauge = m["gtfsrt_last_scrape_success"].collect()[0]
    assert gauge["last_scrape_success"] == 0  # last scrape failed


def test_per_url_independence(spark):
    # GtfsRtMetricsRegistryTest.java:259-286
    other = "https://example.com/second"
    rows = [
        (URL, "success", 10, NOW, 5),
        (other, "io_error", None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, result string, entity_count int, "
        "feed_timestamp long, timestamp_age_seconds long"
    )
    m = scrape_metrics(df)
    gauges = {
        r["url"]: r["last_scrape_success"]
        for r in m["gtfsrt_last_scrape_success"].collect()
    }
    assert gauges == {URL: 1, other: 0}


def test_gtfsrt_metric_envelopes_match_reference_shape(spark):
    import json as _json

    from transitdata_monitor_data_collector_spark.sources.gtfsrt import (
        SCRAPE_SCHEMA,
        gtfsrt_metric_envelopes,
    )

    scrapes = spark.createDataFrame(
        [
            ("http://a/feed", "success", 120, 1700000000, 7),
            ("http://b/feed", "http_503", None, None, None),
        ],
        SCRAPE_SCHEMA,
    )
    envs = gtfsrt_metric_envelopes(scrapes, "2024-05-01T12:00:00")
    assert set(envs) == {"Entity Count", "Timestamp Age"}

    ec = envs["Entity Count"].collect()
    assert [r["url"] for r in ec] == ["http://a/feed"]  # failures excluded
    doc = _json.loads(ec[0]["envelope_json"])
    # exact reference envelope (gtfsrt_data_collector.py:31-46)
    assert doc == {
        "time": "2024-05-01T12:00:00",
        "data": {
            "baseData": {
                "metric": "Entity Count",
                "namespace": "GTFSRT",
                "dimNames": ["URL"],
                "series": [
                    {"dimValues": ["http://a/feed"], "sum": 120, "count": 1}
                ],
            }
        },
    }
    ta = _json.loads(envs["Timestamp Age"].collect()[0]["envelope_json"])
    assert ta["data"]["baseData"]["series"][0]["sum"] == 7


# ---------------------------------------------------------------------------
# Full entity decode (round-5: per-entity analytics surface)
# ---------------------------------------------------------------------------


def _full_decode_imports():
    from transitdata_monitor_data_collector_spark.sources.gtfsrt import (
        FeedParseError,
        decode_feed_entities,
        encode_feed_message,
        encode_trip_update_entity,
        encode_vehicle_entity,
        parse_feed_entities,
    )

    return (
        FeedParseError,
        decode_feed_entities,
        encode_feed_message,
        encode_trip_update_entity,
        encode_vehicle_entity,
        parse_feed_entities,
    )


def test_vehicle_position_roundtrip():
    _, _, enc_msg, _, enc_vp, parse = _full_decode_imports()
    body = enc_msg(
        timestamp=1700000000,
        entities=[
            enc_vp(
                "veh-1",
                trip_id="trip-9",
                route_id="550",
                start_date="20240501",
                direction_id=1,
                vehicle_id="bus-42",
                latitude=60.25,       # exactly representable in float32
                longitude=24.9375,
                bearing=90.0,
                speed=13.5,
                stop_id="HSL:1234",
                current_stop_sequence=7,
                timestamp=1700000005,
            )
        ],
    )
    ents = parse(body)
    assert len(ents) == 1
    e = ents[0]
    assert e["entity_id"] == "veh-1" and e["kind"] == "vehicle"
    assert e["trip_id"] == "trip-9" and e["route_id"] == "550"
    assert e["start_date"] == "20240501" and e["direction_id"] == 1
    assert e["vehicle_id"] == "bus-42"
    assert e["latitude"] == 60.25 and e["longitude"] == 24.9375
    assert e["bearing"] == 90.0 and e["speed"] == 13.5
    assert e["stop_id"] == "HSL:1234" and e["current_stop_sequence"] == 7
    assert e["vp_timestamp"] == 1700000005
    assert e["tu_delay"] is None  # the other family stays None


def test_trip_update_roundtrip_negative_delay():
    _, _, enc_msg, enc_tu, _, parse = _full_decode_imports()
    body = enc_msg(
        entities=[
            enc_tu(
                "tu-1",
                trip_id="trip-3",
                route_id="M1",
                delay=-45,  # early: int32 negatives are 10-byte varints
                timestamp=1700000100,
                vehicle_id="train-7",
                stop_time_updates=[
                    (1, "STOP-A", -30, None),
                    (2, "STOP-B", 15, 20),
                ],
            )
        ]
    )
    e = parse(body)[0]
    assert e["kind"] == "trip_update" and e["tu_delay"] == -45
    assert e["tu_timestamp"] == 1700000100 and e["vehicle_id"] == "train-7"
    assert e["stop_time_updates"] == [
        {"stop_sequence": 1, "stop_id": "STOP-A", "arrival_delay": -30, "departure_delay": None},
        {"stop_sequence": 2, "stop_id": "STOP-B", "arrival_delay": 15, "departure_delay": 20},
    ]
    assert e["latitude"] is None


def test_entity_decode_edge_cases():
    FeedParseError, _, enc_msg, enc_tu, enc_vp, parse = _full_decode_imports()
    import pytest as _pytest

    # id-only entities (the reference's count-only shape) decode as unknown kind
    body = enc_msg(entity_ids=["a", "b"])
    ents = parse(body)
    assert [e["entity_id"] for e in ents] == ["a", "b"]
    assert all(e["kind"] == "unknown" for e in ents)
    # header-only feed: zero entities, no error
    assert parse(enc_msg(timestamp=5)) == []
    # garbage raises
    with _pytest.raises(FeedParseError):
        parse(b"this is not protobuf at all \xff\xff")
    # truncated entity raises
    good = enc_msg(entities=[enc_vp("x", latitude=1.0)])
    with _pytest.raises(FeedParseError):
        parse(good[:-3])
    # unknown fields inside an entity are skipped, known ones survive
    ent = enc_vp("y", latitude=2.5)
    ent += b"\xaa\x06\x03abc"  # field 101, wire 2 — unknown, skipped
    e = parse(enc_msg(entities=[ent]))[0]
    assert e["entity_id"] == "y" and e["latitude"] == 2.5


def test_decode_feed_entities_spark(spark):
    _, decode, enc_msg, enc_tu, enc_vp, _ = _full_decode_imports()
    bodies = [
        ("http://a", enc_msg(entities=[
            enc_vp("v1", route_id="550", latitude=60.5, longitude=24.75),
            enc_tu("t1", route_id="550", delay=-10),
        ])),
        ("http://b", b"garbage \xff"),  # parse failure -> zero rows
        ("http://c", enc_msg(entity_ids=["plain"])),
    ]
    df = spark.createDataFrame(bodies, "url string, body binary")
    rows = {(r["url"], r["entity_id"]): r for r in decode(df).collect()}
    assert set(rows) == {("http://a", "v1"), ("http://a", "t1"), ("http://c", "plain")}
    assert rows[("http://a", "v1")]["kind"] == "vehicle"
    assert rows[("http://a", "v1")]["latitude"] == 60.5
    assert rows[("http://a", "t1")]["tu_delay"] == -10
    assert rows[("http://c", "plain")]["kind"] == "unknown"
