"""Minimal HTTP serving layer: /liveness, /health, /metrics.

The reference wires three endpoints onto ``com.sun.net.httpserver``
(``Main.java:35-55``: ``LivenessEndpoint`` always-200, ``HealthEndpoint``
503-until-ready, ``MetricsEndpoint`` rendering the Prometheus registry).
This is the same wiring on the standard-library ``http.server`` — no web
framework, matching the reference's deliberately trivial HTTP layer.

The server is transport only: all state lives in the three injected
callables (usually ``CollectorApp.liveness`` / ``.readiness`` /
``.metrics_page``), so it composes with any app object and tests can
inject plain lambdas. Runs on a daemon thread; ``close()`` releases the
port (Main.java's shutdown hook analog).
"""

from __future__ import annotations

import logging
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from transitdata_monitor_data_collector_spark.streaming.health import HealthStatus

__all__ = ["MonitorHttpServer"]

log = logging.getLogger(__name__)

_PROM_CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"


class MonitorHttpServer:
    """Serve liveness/health/metrics for a collector app.

    ``port=0`` binds an ephemeral port (tests); read the bound port from
    ``.port`` after ``start()``.
    """

    def __init__(
        self,
        liveness: Callable[[], HealthStatus],
        readiness: Callable[[], HealthStatus],
        metrics_page: Callable[[], str],
        port: int = 8080,
        host: str = "",
    ) -> None:
        self._handlers = {
            "/liveness": liveness,
            "/health": readiness,
        }
        self._metrics_page = metrics_page
        self._server = ThreadingHTTPServer(
            (host, port), self._make_handler()
        )
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def _make_handler(self):
        handlers = self._handlers
        metrics_page = self._metrics_page

        class _Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - http.server API
                path = self.path.split("?", 1)[0].rstrip("/") or "/"
                if path == "/metrics":
                    try:
                        body = metrics_page().encode()
                    except Exception as e:  # surface render errors as 500
                        self._reply(500, f"metrics error: {e}".encode())
                        return
                    self._reply(200, body, _PROM_CONTENT_TYPE)
                elif path in handlers:
                    st = handlers[path]()
                    self._reply(st.http_status, st.detail.encode())
                else:
                    self._reply(404, b"not found")

            def _reply(self, code: int, body: bytes, ctype: str = "text/plain"):
                try:
                    self.send_response(code)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except OSError as e:
                    # client went away mid-send: not fatal, but never silent
                    log.warning(
                        "failed to send %s response for %s: %s",
                        code, self.path, e,
                    )

            def log_message(self, fmt, *args):  # route to logging, not stderr
                log.debug("%s " + fmt, self.client_address[0], *args)

        return _Handler

    def start(self) -> "MonitorHttpServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
