"""HTTP serving layer: the Main.java:35-55 endpoint wiring, smoke-tested
over a real socket."""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest

from transitdata_monitor_data_collector_spark.serving import MonitorHttpServer
from transitdata_monitor_data_collector_spark.streaming.health import HealthStatus


@pytest.fixture()
def server():
    ready = {"ok": False}

    def readiness():
        if ready["ok"]:
            return HealthStatus(True, 200, "OK")
        return HealthStatus(False, 503, "not ready")

    srv = MonitorHttpServer(
        liveness=lambda: HealthStatus(True, 200, "OK"),
        readiness=readiness,
        metrics_page=lambda: "# TYPE mqtt_connected gauge\n"
        'mqtt_connected{broker="tcp://x:1883"} 1\n',
        port=0,
    ).start()
    yield srv, ready
    srv.close()


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), e.headers.get("Content-Type")


def test_endpoints(server):
    srv, ready = server
    assert _get(srv.port, "/liveness")[:2] == (200, "OK")
    # 503 until the app is ready, 200 after (HealthEndpoint.java:17-43)
    assert _get(srv.port, "/health")[0] == 503
    ready["ok"] = True
    assert _get(srv.port, "/health")[:2] == (200, "OK")
    code, body, ctype = _get(srv.port, "/metrics")
    assert code == 200
    assert "mqtt_connected" in body
    assert ctype.startswith("text/plain")
    assert _get(srv.port, "/nope")[0] == 404


def test_metrics_render_error_becomes_500():
    def boom():
        raise RuntimeError("render failed")

    srv = MonitorHttpServer(
        liveness=lambda: HealthStatus(True, 200, "OK"),
        readiness=lambda: HealthStatus(True, 200, "OK"),
        metrics_page=boom,
        port=0,
    ).start()
    try:
        code, body, _ = _get(srv.port, "/metrics")
        assert code == 500 and "render failed" in body
    finally:
        srv.close()


def test_serves_app_metrics_end_to_end(spark, tmp_path):
    """Full loop: replay stream -> CollectorApp -> HTTP /metrics."""
    import json

    from transitdata_monitor_data_collector_spark.app import CollectorApp
    from transitdata_monitor_data_collector_spark.sources.mqtt import (
        register_sources,
    )
    from tests.test_app import CONFIG

    path = tmp_path / "m.jsonl"
    rows = [
        {"broker": "tcp://mqtt.hsl.fi:1883", "topic": "$connection",
         "payload": "connect", "ts": "2024-01-01T00:00:00"},
        {"broker": "tcp://mqtt.hsl.fi:1883",
         "topic": "/hfp/v2/journey/ongoing/vp/bus", "ts": "2024-01-01T00:00:01"},
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    register_sources(spark)
    stream = spark.readStream.format("mqtt-replay").option("path", str(path)).load()
    app = CollectorApp(spark, CONFIG, stream).start()
    srv = MonitorHttpServer(
        app.liveness, app.readiness, app.metrics_page, port=0
    ).start()
    try:
        app.process_available()
        code, body, _ = _get(srv.port, "/metrics")
        assert code == 200
        assert 'mqtt_messages_received_total{broker="tcp://mqtt.hsl.fi:1883"' in body
        assert 'mqtt_connected{broker="tcp://mqtt.hsl.fi:1883"} 1' in body
        assert _get(srv.port, "/health")[0] == 200
    finally:
        srv.close()
        app.stop()
