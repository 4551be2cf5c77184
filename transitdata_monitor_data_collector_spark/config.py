"""Typed engine configuration.

Mirrors the reference's two config surfaces with identical validation rules:

- the Java exporter's HOCON ``AppConfig`` (reference
  ``transitdata-metrics-exporter/.../AppConfig.java:22-100``): required
  keys, ISO-8601 durations, ``mqtt.qos`` ∈ {0,1,2}
  (``AppConfig.java:75-79``), ``gtfsrt.pollInterval`` strictly longer than
  ``gtfsrt.clientTimeout`` (``AppConfig.java:81-86``), and the
  JSON-string fallback for list-valued keys (``AppConfig.java:40-52,55-73``
  — lists may arrive as a JSON string via env substitution);
- the Python collector's ``TOPIC<i>=address,name,port`` env enumeration
  (reference ``src/mqtt_data_collector.py:151-171`` — exactly two commas
  required, indices scanned from 1 upward).

This is driver-side configuration, not a Spark op; broker/topic registries
derived from it become small broadcastable dimension DataFrames.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

__all__ = [
    "ConfigError",
    "MqttBrokerConfig",
    "EngineConfig",
    "MqttCollectorTopic",
    "parse_iso_duration",
    "parse_topic_env",
]


class ConfigError(ValueError):
    """Invalid or missing configuration (IllegalArgumentException analog)."""


_DURATION_RE = re.compile(
    r"^(?P<sign>[-+]?)P(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?"
    r"(?:(?P<seconds>\d+(?:\.\d+)?)S)?)?$",
    re.IGNORECASE,
)


def parse_iso_duration(s: str) -> float:
    """ISO-8601 duration (``PT30S``, ``PT5M``, ``P1DT2H``) → seconds.

    Same grammar subset ``java.time.Duration.parse`` accepts for the
    reference's config values (``application.conf:4-17``).
    """
    m = _DURATION_RE.match(s.strip())
    if not m or all(
        m.group(g) is None for g in ("days", "hours", "minutes", "seconds")
    ):
        raise ConfigError(f"Text cannot be parsed to a Duration: {s!r}")
    parts = m.groupdict()
    total = (
        float(parts["days"] or 0) * 86400
        + float(parts["hours"] or 0) * 3600
        + float(parts["minutes"] or 0) * 60
        + float(parts["seconds"] or 0)
    )
    return -total if parts["sign"] == "-" else total


def _require(cfg: Mapping[str, Any], path: str) -> Any:
    v = cfg.get(path)
    if v is None:
        raise ConfigError(f"{path} is required")
    return v


def _as_list(value: Any, key: str) -> list:
    """List-typed key with the reference's JSON-string fallback
    (AppConfig.java:44-52: a string value is parsed as JSON)."""
    if isinstance(value, str):
        try:
            value = json.loads(value)
        except json.JSONDecodeError as e:
            raise ConfigError(f"{key} is not a valid list: {e}") from e
    if not isinstance(value, list):
        raise ConfigError(f"{key} must be a list")
    return value


@dataclass(frozen=True)
class MqttBrokerConfig:
    """One broker connection: address + its subscribed topic filters
    (MqttBrokerConfig.java:5-6)."""

    address: str
    topic_filters: tuple[str, ...]


@dataclass(frozen=True)
class EngineConfig:
    """Validated engine config (AppConfig.java:13-15 record analog)."""

    port: int
    gtfsrt_urls: tuple[str, ...]
    gtfsrt_poll_interval_s: float
    gtfsrt_client_timeout_s: float
    mqtt_client_id: str
    mqtt_connection_timeout_s: float
    mqtt_keep_alive_interval_s: float
    mqtt_qos: int
    mqtt_brokers: tuple[MqttBrokerConfig, ...] = field(default_factory=tuple)

    @classmethod
    def from_mapping(cls, cfg: Mapping[str, Any]) -> "EngineConfig":
        """Build + validate from a flat dotted-key mapping — the HOCON
        paths the reference reads (AppConfig.java:23-37)."""
        port = int(_require(cfg, "port"))
        urls = tuple(_as_list(_require(cfg, "gtfsrt.urls"), "gtfsrt.urls"))
        poll = parse_iso_duration(str(_require(cfg, "gtfsrt.pollInterval")))
        timeout = parse_iso_duration(str(_require(cfg, "gtfsrt.clientTimeout")))
        if poll <= timeout:
            raise ConfigError(
                f"gtfsrt.pollInterval ({poll}s) must be longer than "
                f"gtfsrt.clientTimeout ({timeout}s)."
            )
        qos = int(_require(cfg, "mqtt.qos"))
        if qos < 0 or qos > 2:
            raise ConfigError(f"mqtt.qos must be 0, 1, or 2, but was {qos}")
        brokers = []
        raw_brokers = cfg.get("mqtt.brokers")
        if raw_brokers is not None:
            for b in _as_list(raw_brokers, "mqtt.brokers"):
                brokers.append(
                    MqttBrokerConfig(
                        address=str(_require(b, "address")),
                        topic_filters=tuple(
                            _as_list(_require(b, "topicFilters"), "topicFilters")
                        ),
                    )
                )
        return cls(
            port=port,
            gtfsrt_urls=urls,
            gtfsrt_poll_interval_s=poll,
            gtfsrt_client_timeout_s=timeout,
            mqtt_client_id=str(_require(cfg, "mqtt.clientId")),
            mqtt_connection_timeout_s=parse_iso_duration(
                str(_require(cfg, "mqtt.connectionTimeout"))
            ),
            mqtt_keep_alive_interval_s=parse_iso_duration(
                str(_require(cfg, "mqtt.keepAliveInterval"))
            ),
            mqtt_qos=qos,
            mqtt_brokers=tuple(brokers),
        )


@dataclass(frozen=True)
class MqttCollectorTopic:
    """One monitored topic from the Python collector's env scheme
    (``TOPIC<i>=address,name,port``, mqtt_data_collector.py:158-169)."""

    address: str
    topic: str
    port: int


def parse_topic_env(
    env: Mapping[str, str] | None = None,
) -> list[MqttCollectorTopic]:
    """Scan ``TOPIC1..TOPICn`` env vars; stop at the first missing index.

    Each value must contain exactly two commas
    (mqtt_data_collector.py:158-166 raises on malformed input).
    """
    env = dict(os.environ if env is None else env)
    out: list[MqttCollectorTopic] = []
    i = 1
    while (raw := env.get(f"TOPIC{i}")) is not None:
        if raw.count(",") != 2:
            raise ConfigError(
                f"TOPIC{i} must be in format <address>,<topic>,<port>: {raw!r}"
            )
        address, topic, port = (p.strip() for p in raw.split(","))
        out.append(MqttCollectorTopic(address=address, topic=topic, port=int(port)))
        i += 1
    return out
