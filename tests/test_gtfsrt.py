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
