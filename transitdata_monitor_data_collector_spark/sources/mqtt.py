"""MQTT streaming source via the Spark 4 Python Data Source API.

Re-expresses the reference's ingest layer — paho callbacks incrementing
shared counters (``src/mqtt_data_collector.py:45-97``,
``…/mqtt/MqttTopicMonitorListener.java:94-135``) — as a proper Spark
streaming source: the broker push lands in a bounded in-process buffer, and
Spark drains it per micro-batch as offset ranges. Schema (FIXTURES.md §1):

    broker: string, topic: string, payload: binary, ts: timestamp

Design points carried over from the reference:

- **Filter pushdown to SUBSCRIBE**: the ``topicFilters`` option becomes the
  broker-side subscription set (``MqttTopicMonitorListener.java:107-112``)
  — the broker is the storage engine, filtering at the source like
  DataSource filter pushdown.
- **Flow control**: ``maxBatchSize`` bounds rows per micro-batch, the
  analog of MAX_INFLIGHT_MESSAGES=1000 sized for 10k msg/s at 100 ms RTT
  (``MqttTopicMonitorListener.java:29-37,163``).
- **QoS** 0-2 validated as in ``AppConfig.java:75-79``.
- **Multi-broker fan-in** (``Main.java:76-85``): one source per broker,
  ``unionByName`` the streams.

The live path uses ``paho-mqtt`` when installed and otherwise falls back
to the vendored spec-subset client (``vendor/mqttshim`` — MQTT 3.1.1 wire
protocol from the public OASIS spec). With the in-process loopback broker
(``vendor/mqttshim/broker.py``) the live path IS integration-tested over
real TCP (tests/test_mqtt_live.py) — connect event, SUBSCRIBE pushdown,
QoS-1 delivery, and the connection-lost event on a broker crash. The
*replay* source below remains the deterministic high-volume path.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "MqttDataSource",
    "MqttReplayDataSource",
    "MQTT_SCHEMA",
    "CONNECTION_TOPIC",
    "register_sources",
]

#: Reserved topic for connection-state events, interleaved into the message
#: stream so downstream jobs can derive the reference's ``mqtt_connected``
#: gauge and ``mqtt_connection_lost`` counter
#: (MqttTopicMonitorListener.java:61-70,119-122). Per the MQTT spec a
#: broker never delivers ``$``-prefixed topics to ``#`` subscriptions, so
#: no real message can collide with this name; message jobs exclude it
#: before fan-out (streaming/jobs.py:_fanout) so connection events never
#: land in the unknown-bucket counters.
#: Payloads: b"connect" | b"disconnect" | b"connection_lost".
CONNECTION_TOPIC = "$connection"

MQTT_SCHEMA = StructType(
    [
        StructField("broker", StringType(), False),
        StructField("topic", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("ts", TimestampType(), False),
    ]
)


def _arrow_schema():
    """Arrow twin of MQTT_SCHEMA for the live reader's vectorized drain
    (must match what the JVM expects from the python runner:
    pyspark.sql.pandas.types.to_arrow_schema(MQTT_SCHEMA))."""
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("broker", pa.string(), nullable=False),
            pa.field("topic", pa.string(), nullable=False),
            pa.field("payload", pa.binary(), nullable=True),
            pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=False),
        ]
    )


def _validate_qos(qos: int) -> int:
    if qos < 0 or qos > 2:
        raise ValueError(f"qos must be 0, 1, or 2, but was {qos}")
    return qos


class MqttDataSource(DataSource):
    """``spark.readStream.format("mqtt")`` — live broker source.

    Options:
      broker (required)     e.g. ``tcp://mqtt.hsl.fi:1883``
      topicFilters          JSON list or comma-separated filters; pushed
                            into SUBSCRIBE (default ``#``)
      qos                   0|1|2 (default 0, at-most-once like the
                            reference default, application.conf:18-19)
      maxBatchSize          max rows per micro-batch (default 10000)
      keepAlive             seconds (default 20, application.conf:16-17)
    """

    @classmethod
    def name(cls) -> str:
        return "mqtt"

    def schema(self) -> StructType:
        return MQTT_SCHEMA

    def simpleStreamReader(self, schema: StructType):
        return _MqttLiveReader(self.options)


def _parse_filters(raw: str | None) -> list[str]:
    if not raw:
        return ["#"]
    raw = raw.strip()
    if raw.startswith("["):
        return list(json.loads(raw))
    return [f.strip() for f in raw.split(",") if f.strip()]


class _MqttLiveReader(SimpleDataSourceStreamReader):
    """Buffers paho pushes; each ``read`` drains up to maxBatchSize rows.

    Offsets are monotone sequence numbers over the received stream —
    at-most-once at QoS 0 exactly like the reference; replays within a
    restarted query re-read only the in-memory buffer (the broker does not
    persist QoS-0 history, ``MqttTopicMonitorListener.java:157-164``
    ``cleanSession(false)`` only buffers QoS>0).
    """

    def __init__(self, options):
        self._broker = options.get("broker")
        if not self._broker:
            raise ValueError("option 'broker' is required")
        self._filters = _parse_filters(options.get("topicFilters"))
        self._qos = _validate_qos(int(options.get("qos", "0")))
        self._max_batch = int(options.get("maxBatchSize", "10000"))
        self._keep_alive = int(options.get("keepAlive", "20"))
        self._buffer: list[tuple] = []
        # paho's network thread appends while Spark's read() drains; the
        # lock makes the drain atomic (an unguarded two-slice swap could
        # silently drop a message appended between the slices — loss beyond
        # the intended QoS-0 at-most-once semantics)
        self._lock = threading.Lock()
        self._seq = 0
        self._client = None

    def __getstate__(self):
        # Spark pickles the reader into the executor-side read function
        # each micro-batch (plan_data_source_read). The live socket, its
        # lock and buffer stay with the driver-side prefetch process —
        # the executor copy only ever calls readBetweenOffsets(), which
        # is empty by design (QoS-0 at-most-once).
        state = self.__dict__.copy()
        state["_client"] = None
        state["_lock"] = None
        state["_buffer"] = []
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _ensure_client(self):
        if self._client is not None:
            return
        try:
            import paho.mqtt.client as mqtt  # type: ignore[import-not-found]
        except ImportError:
            # No paho wheel in this environment — fall back to the
            # vendored MQTT 3.1.1 wire-protocol client (vendor/mqttshim,
            # paho-compatible surface), which is also what the loopback
            # integration tests exercise end to end.
            from transitdata_monitor_data_collector_spark.vendor import (
                mqttshim as mqtt,
            )

        host, port = self._host_port()
        client = mqtt.Client()

        def _now():
            # epoch micros (UTC by definition) — goes straight into the
            # arrow timestamp[us, tz=UTC] column at drain time with no
            # per-row datetime object
            return time.time_ns() // 1_000

        def _emit(topic: str, payload: bytes) -> None:
            with self._lock:
                self._buffer.append((self._broker, topic, payload, _now()))

        def on_connect(c, userdata, flags, rc):
            # connection-state event first (mqtt_connected gauge input,
            # MqttTopicMonitorListener.java:61-64), then (re)subscribe as
            # in connectComplete (:104-116)
            _emit(CONNECTION_TOPIC, b"connect")
            for f in self._filters:
                c.subscribe(f, qos=self._qos)

        def on_disconnect(c, userdata, rc):
            # rc != 0 is an UNEXPECTED drop — the reference's connectionLost
            # callback, which increments mqtt_connection_lost (:119-122);
            # rc == 0 is a clean close() disconnect, gauge-only
            _emit(
                CONNECTION_TOPIC,
                b"connection_lost" if rc != 0 else b"disconnect",
            )

        def on_message(c, userdata, msg):
            _emit(msg.topic, bytes(msg.payload))

        def on_message_batch(c, userdata, msgs):
            # mqttshim extension (ignored by paho, which calls
            # on_message per row): messages that arrived in one TCP
            # segment share one arrival timestamp and one buffer lock
            # acquisition — the per-message Python overhead otherwise
            # caps the live drain rate near the 10k msg/s budget
            broker, ts = self._broker, _now()
            rows = [(broker, m.topic, bytes(m.payload), ts) for m in msgs]
            with self._lock:
                self._buffer.extend(rows)

        client.on_connect = on_connect
        client.on_disconnect = on_disconnect
        client.on_message = on_message
        client.on_message_batch = on_message_batch
        client.connect(host, port, keepalive=self._keep_alive)
        client.loop_start()
        self._client = client

    def _host_port(self) -> tuple[str, int]:
        addr = self._broker.split("://", 1)[-1]
        host, _, port = addr.partition(":")
        return host, int(port or 1883)

    def read(self, start: dict):
        self._ensure_client()
        with self._lock:
            n = min(len(self._buffer), self._max_batch)
            rows, self._buffer = self._buffer[:n], self._buffer[n:]
        self._seq += n
        if not rows:
            return iter(()), {"seq": self._seq}
        # Vectorized drain: ship the batch as ONE pyarrow RecordBatch —
        # the python runner passes RecordBatches through untouched
        # (records_to_arrow_batches), skipping the per-row type-check +
        # conversion that otherwise caps the live path around the
        # 10k msg/s budget (measured ~50us/row on the tuple path).
        import pyarrow as pa

        schema = _arrow_schema()
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.string()),
                pa.array([r[1] for r in rows], pa.string()),
                pa.array([r[2] for r in rows], pa.binary()),
                pa.array([r[3] for r in rows], pa.timestamp("us", tz="UTC")),
            ],
            schema=schema,
        )
        return iter([batch]), {"seq": self._seq}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(())  # QoS-0 history is gone; at-most-once by design

    def stop(self):
        if self._client is not None:
            self._client.loop_stop()
            self._client.disconnect()


# ---------------------------------------------------------------------------
# Deterministic replay source — same DataSource machinery, file-backed
# ---------------------------------------------------------------------------


@dataclass
class _ReplayPartition(InputPartition):
    path: str
    start: int
    end: int


class MqttReplayDataSource(DataSource):
    """``spark.readStream.format("mqtt-replay")`` — replays a JSON-lines
    file of ``{broker, topic, payload?, ts}`` records as the MQTT stream,
    ``rowsPerBatch`` per micro-batch. This is the CI-testable stand-in for
    the live source (the reference never tests live MQTT either)."""

    @classmethod
    def name(cls) -> str:
        return "mqtt-replay"

    def schema(self) -> StructType:
        return MQTT_SCHEMA

    def streamReader(self, schema: StructType):
        return _ReplayReader(self.options)


class _ReplayReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("option 'path' is required")
        self._rows_per_batch = int(options.get("rowsPerBatch", "1000"))
        # split each micro-batch's row range into this many read tasks:
        # the Python-side JSON parse then runs in parallel across cores
        # (a single 20k-row partition is otherwise a serial read head)
        self._read_partitions = max(1, int(options.get("readPartitions", "1")))
        with open(self._path) as f:
            self._total = sum(1 for line in f if line.strip())
        self._offered = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # Advance at most rowsPerBatch per trigger, so the replay is
        # genuinely MULTI-BATCH: watermarks progress between micro-batches
        # and append-mode windows finalize exactly as they would against a
        # live broker. (Returning the file end here would collapse the
        # whole replay into one batch — watermark semantics untestable.)
        self._offered = min(self._offered + self._rows_per_batch, self._total)
        return {"row": self._offered}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        chunk = max(
            1, -(-self._rows_per_batch // self._read_partitions)
        )  # ceil div
        out = []
        pos = lo
        while pos < hi:
            nxt = min(pos + chunk, hi)
            out.append(_ReplayPartition(self._path, pos, nxt))
            pos = nxt
        return out or [_ReplayPartition(self._path, lo, lo)]

    def read(self, partition: _ReplayPartition):
        with open(partition.path) as f:
            for i, line in enumerate(ln for ln in f if ln.strip()):
                if i < partition.start:
                    continue
                if i >= partition.end:
                    break
                rec = json.loads(line)
                payload = rec.get("payload")
                yield (
                    rec["broker"],
                    rec["topic"],
                    payload.encode() if isinstance(payload, str) else payload,
                    datetime.fromisoformat(rec["ts"]),
                )

    def commit(self, end: dict) -> None:
        pass


def register_sources(spark) -> None:
    """Register both sources on a session (idempotent)."""
    spark.dataSource.register(MqttDataSource)
    spark.dataSource.register(MqttReplayDataSource)
