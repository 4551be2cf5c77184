"""Config validation matrix — ports the reference's AppConfigTest cases
(transitdata-metrics-exporter/.../AppConfigTest.java:1-293): required keys,
qos bounds, pollInterval > clientTimeout, JSON-string list fallback,
multi-broker parsing; plus the Python collector's TOPIC<i> env scheme
(mqtt_data_collector.py:151-171)."""

from __future__ import annotations

import pytest

from transitdata_monitor_data_collector_spark.config import (
    ConfigError,
    EngineConfig,
    parse_iso_duration,
    parse_topic_env,
)

BASE = {
    "port": 8080,
    "gtfsrt.urls": ["https://example.com/feed1", "https://example.com/feed2"],
    "gtfsrt.pollInterval": "PT30S",
    "gtfsrt.clientTimeout": "PT5S",
    "mqtt.clientId": "transitdata-monitor",
    "mqtt.connectionTimeout": "PT15S",
    "mqtt.keepAliveInterval": "PT20S",
    "mqtt.qos": 0,
    "mqtt.brokers": [
        {"address": "tcp://mqtt.hsl.fi:1883", "topicFilters": ["/hfp/v2/journey/#"]},
    ],
}


def cfg(**overrides):
    d = {**BASE, **overrides}
    for k, v in overrides.items():
        if v is None:
            d.pop(k)
    return d


def test_parses_full_config():
    c = EngineConfig.from_mapping(BASE)
    assert c.port == 8080
    assert c.gtfsrt_urls == tuple(BASE["gtfsrt.urls"])
    assert c.gtfsrt_poll_interval_s == 30.0
    assert c.gtfsrt_client_timeout_s == 5.0
    assert c.mqtt_keep_alive_interval_s == 20.0
    assert c.mqtt_brokers[0].address == "tcp://mqtt.hsl.fi:1883"
    assert c.mqtt_brokers[0].topic_filters == ("/hfp/v2/journey/#",)


def test_multi_broker():
    c = EngineConfig.from_mapping(
        cfg(
            **{
                "mqtt.brokers": [
                    {"address": "tcp://a:1883", "topicFilters": ["x/#", "y/+"]},
                    {"address": "wss://b:443", "topicFilters": ["z"]},
                ]
            }
        )
    )
    assert len(c.mqtt_brokers) == 2
    assert c.mqtt_brokers[1].topic_filters == ("z",)


def test_json_string_fallback_for_urls_and_brokers():
    # AppConfigTest.java:105-142 — env substitution delivers lists as JSON
    c = EngineConfig.from_mapping(
        cfg(
            **{
                "gtfsrt.urls": '["https://example.com/a"]',
                "mqtt.brokers": '[{"address": "tcp://a:1", "topicFilters": ["#"]}]',
            }
        )
    )
    assert c.gtfsrt_urls == ("https://example.com/a",)
    assert c.mqtt_brokers[0].topic_filters == ("#",)


@pytest.mark.parametrize(
    "missing",
    [
        "port",
        "gtfsrt.urls",
        "gtfsrt.pollInterval",
        "gtfsrt.clientTimeout",
        "mqtt.clientId",
        "mqtt.connectionTimeout",
        "mqtt.keepAliveInterval",
        "mqtt.qos",
    ],
)
def test_required_keys(missing):
    # AppConfigTest.java:224-287
    with pytest.raises(ConfigError, match=f"{missing} is required"):
        EngineConfig.from_mapping(cfg(**{missing: None}))


def test_brokers_optional():
    c = EngineConfig.from_mapping(cfg(**{"mqtt.brokers": None}))
    assert c.mqtt_brokers == ()


@pytest.mark.parametrize("qos", [-1, 3, 99])
def test_qos_bounds(qos):
    # AppConfig.java:75-79
    with pytest.raises(ConfigError, match="mqtt.qos must be 0, 1, or 2"):
        EngineConfig.from_mapping(cfg(**{"mqtt.qos": qos}))


@pytest.mark.parametrize("qos", [0, 1, 2])
def test_qos_valid(qos):
    assert EngineConfig.from_mapping(cfg(**{"mqtt.qos": qos})).mqtt_qos == qos


@pytest.mark.parametrize(
    ("poll", "timeout"),
    [("PT5S", "PT5S"), ("PT4S", "PT5S"), ("PT1M", "PT2M")],
)
def test_poll_interval_must_exceed_timeout(poll, timeout):
    # AppConfig.java:81-86, AppConfigTest.java:145-221
    with pytest.raises(ConfigError, match="must be longer than"):
        EngineConfig.from_mapping(
            cfg(**{"gtfsrt.pollInterval": poll, "gtfsrt.clientTimeout": timeout})
        )


@pytest.mark.parametrize(
    ("text", "seconds"),
    [
        ("PT30S", 30.0),
        ("PT5M", 300.0),
        ("PT1H", 3600.0),
        ("P1D", 86400.0),
        ("PT1M30S", 90.0),
        ("P1DT2H", 93600.0),
        ("pt15s", 15.0),
    ],
)
def test_duration_parse(text, seconds):
    assert parse_iso_duration(text) == seconds


@pytest.mark.parametrize("bad", ["", "P", "PT", "30S", "PT5X", "5 seconds"])
def test_duration_parse_rejects(bad):
    with pytest.raises(ConfigError):
        parse_iso_duration(bad)


def test_topic_env_parse():
    env = {
        "TOPIC1": "mqtt.hsl.fi,/hfp/v2/journey/#,8883",
        "TOPIC2": "mqtt-dev.hsl.fi,/hfp/v2/+/ongoing/#,443",
    }
    topics = parse_topic_env(env)
    assert [t.topic for t in topics] == ["/hfp/v2/journey/#", "/hfp/v2/+/ongoing/#"]
    assert topics[0].port == 8883


def test_topic_env_stops_at_gap():
    env = {"TOPIC1": "a,b,1", "TOPIC3": "c,d,2"}  # TOPIC2 missing
    assert len(parse_topic_env(env)) == 1


@pytest.mark.parametrize("bad", ["a,b", "a,b,c,d", "nocommas"])
def test_topic_env_requires_two_commas(bad):
    # mqtt_data_collector.py:158-166
    with pytest.raises(ConfigError):
        parse_topic_env({"TOPIC1": bad})
