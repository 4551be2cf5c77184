"""MQTT source tests: the replay DataSource exercises the real Python
Data Source API plumbing (schema, offsets, partitions, micro-batching);
the live source's option validation is tested without a broker (the
reference never integration-tests live MQTT either, SURVEY §5)."""

from __future__ import annotations

import json

import pytest

from transitdata_monitor_data_collector_spark.sources.mqtt import (
    MQTT_SCHEMA,
    _MqttLiveReader,
    _parse_filters,
    register_sources,
)
from transitdata_monitor_data_collector_spark.streaming.jobs import run_to_memory

MESSAGES = [
    {"broker": "tcp://a:1883", "topic": "/hfp/v2/journey/ongoing/vp/bus/1",
     "payload": "p1", "ts": "2024-01-01T00:00:01"},
    {"broker": "tcp://a:1883", "topic": "/hfp/v2/journey/ongoing/vp/tram/2",
     "payload": "p2", "ts": "2024-01-01T00:00:02"},
    {"broker": "wss://b:443", "topic": "ext/other", "payload": None,
     "ts": "2024-01-01T00:00:03"},
]


@pytest.fixture()
def replay_file(tmp_path):
    p = tmp_path / "messages.jsonl"
    p.write_text("\n".join(json.dumps(m) for m in MESSAGES) + "\n")
    return str(p)


def test_replay_stream_end_to_end(spark, replay_file):
    register_sources(spark)
    stream = (
        spark.readStream.format("mqtt-replay")
        .option("path", replay_file)
        .option("rowsPerBatch", "2")  # forces multiple partitions/batches
        .load()
    )
    assert stream.schema == MQTT_SCHEMA
    out = run_to_memory(spark, stream, output_mode="append")
    rows = sorted(out.collect(), key=lambda r: r["ts"])
    assert len(rows) == 3
    assert rows[0]["broker"] == "tcp://a:1883"
    assert rows[0]["payload"] == b"p1"
    assert rows[2]["payload"] is None
    assert rows[2]["topic"] == "ext/other"


def test_replay_feeds_windowed_rate_job(spark, replay_file):
    from pyspark.sql import functions as F

    from transitdata_monitor_data_collector_spark.streaming.jobs import (
        windowed_rate_job,
    )

    register_sources(spark)
    stream = (
        spark.readStream.format("mqtt-replay").option("path", replay_file).load()
    )
    rates = windowed_rate_job(stream, ["/hfp/v2/journey/#"])
    out = run_to_memory(spark, rates, output_mode="complete")
    got = {
        (r["topic_filter"]): r["n"]
        for r in out.groupBy("topic_filter")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert got == {"/hfp/v2/journey/#": 2, "unknown": 1}


def test_live_reader_validates_options():
    with pytest.raises(ValueError, match="broker"):
        _MqttLiveReader({})
    with pytest.raises(ValueError, match="qos"):
        _MqttLiveReader({"broker": "tcp://a:1", "qos": "5"})


def test_filter_parsing():
    assert _parse_filters(None) == ["#"]
    assert _parse_filters("a/#, b/+") == ["a/#", "b/+"]
    assert _parse_filters('["x/#", "y"]') == ["x/#", "y"]


def test_live_reader_initial_offset_and_host_port():
    r = _MqttLiveReader({"broker": "tcp://mqtt.hsl.fi:8883"})
    assert r.initialOffset() == {"seq": 0}
    assert r._host_port() == ("mqtt.hsl.fi", 8883)
    r2 = _MqttLiveReader({"broker": "mqtt.hsl.fi"})
    assert r2._host_port() == ("mqtt.hsl.fi", 1883)
