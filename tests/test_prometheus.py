"""Prometheus text exposition tests (MetricsEndpoint.java:17-24 serving
surface; Micrometer naming conventions for counter/gauge/summary)."""

from __future__ import annotations

from transitdata_monitor_data_collector_spark.sinks.prometheus import (
    render_counter,
    render_gauge,
    render_page,
    render_summary,
)


def test_counter_rendering(spark):
    df = spark.createDataFrame(
        [("tcp://a:1883", "/hfp/v2/journey/#", 12345),
         ("tcp://a:1883", "unknown", 7)],
        "broker string, topic_filter string, n long",
    ).orderBy("topic_filter")
    text = render_counter(
        "mqtt_messages_received_total", df, "n", ["broker", "topic_filter"],
        "Total number of received MQTT messages",
    )
    assert "# TYPE mqtt_messages_received_total counter" in text
    assert (
        'mqtt_messages_received_total{broker="tcp://a:1883",'
        'topic_filter="/hfp/v2/journey/#"} 12345.0' in text
    )
    assert 'topic_filter="unknown"} 7.0' in text


def test_gauge_rendering(spark):
    df = spark.createDataFrame(
        [("https://x/feed", 1)], "url string, up int"
    )
    text = render_gauge("gtfsrt_last_scrape_success", df, "up", ["url"])
    assert 'gtfsrt_last_scrape_success{url="https://x/feed"} 1.0' in text


def test_summary_rendering_count_sum_max(spark):
    # count=3 total=370 max=150 — GtfsRtMetricsRegistryTest.java:204-224
    df = spark.createDataFrame(
        [("u", 3, 370, 150)], "url string, c long, s long, m long"
    )
    text = render_summary("gtfsrt_entity_count", df, "c", "s", "m", ["url"])
    assert 'gtfsrt_entity_count_count{url="u"} 3.0' in text
    assert 'gtfsrt_entity_count_sum{url="u"} 370.0' in text
    assert "# TYPE gtfsrt_entity_count_max gauge" in text
    assert 'gtfsrt_entity_count_max{url="u"} 150.0' in text


def test_label_escaping(spark):
    df = spark.createDataFrame([('he said "hi"\n', 1)], "l string, v int")
    text = render_gauge("g", df, "v", ["l"])
    assert 'l="he said \\"hi\\"\\n"' in text


def test_null_value_renders_nan(spark):
    df = spark.createDataFrame([("a", None)], "l string, v double")
    assert "g{l=\"a\"} NaN" in render_gauge("g", df, "v", ["l"])


def test_page_concatenation(spark):
    df = spark.createDataFrame([("a", 1)], "l string, v int")
    page = render_page(
        {
            "c": render_counter("c_total", df, "v", ["l"]),
            "g": render_gauge("g", df, "v", ["l"]),
        }
    )
    assert page.index("c_total") < page.index("# TYPE g gauge")
    assert page.endswith("\n")
