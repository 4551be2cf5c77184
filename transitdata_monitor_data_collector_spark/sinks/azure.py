"""Azure Monitor custom-metrics sink.

Re-expresses the reference's output path (``src/mqtt_data_collector.py:
220-306``, ``src/send_data_to_azure_monitor.py:28-120``) as:

1. a **Column-expression series builder** — the value-shaping rules from
   ``get_series_array`` (round to 2, negate-if-negative, round to whole
   when > 10, sanitize ``#``→``*`` and ``+``→``^``) as pure JVM
   expressions;
2. an **envelope builder** — the exact custom-metric JSON document
   (time / data / baseData / metric / namespace / dimNames / series);
3. a **foreachBatch sink** with the reference's retry envelope: bursts of
   3 attempts, burst gaps of 5 then 10 minutes
   (``mqtt_data_collector.py:255-273``), token refresh on
   TokenExpired/InvalidToken with a driver-local token file cache
   (``send_data_to_azure_monitor.py:60-120``).

HTTP, clock, and sleep are injectable so the full policy is unit-testable;
no real endpoint, credential, or wall-clock wait appears anywhere.

Note on semantics: retries re-POST the same document with the ORIGINAL
window timestamp (``time_str`` is captured at build time) — at-least-once
delivery, duplicates possible, same as the reference (SURVEY §2.7 T5).
"""

from __future__ import annotations

import json
import os
import time as _time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "shaped_metric_value",
    "sanitized_dim_value",
    "series_element",
    "build_envelope_df",
    "AzureMonitorSink",
    "TokenCache",
]


def shaped_metric_value(value: Column) -> Column:
    """round(x,2) → abs → if >10 round to whole
    (mqtt_data_collector.py:281-297 / pulsar_data_collector.py:172-176).

    Rounding is HALF_UP (Spark semantics) — the reference's Python
    ``round`` is banker's; deviation pinned in tests (SURVEY §7 risks).
    """
    r2 = F.abs(F.round(value, 2))
    return F.when(r2 > 10, F.round(r2, 0)).otherwise(r2)


def sanitized_dim_value(key: Column) -> Column:
    """Azure rejects ``#``/``+`` in dimension values — map to ``*``/``^``
    (mqtt_data_collector.py:299-302)."""
    return F.translate(key, "#+", "*^")


def series_element(key: Column, value: Column) -> Column:
    """One series entry ``{dimValues:[key], sum:value, count:1}``
    (mqtt_data_collector.py:304) — Azure's pre-aggregated partial format."""
    return F.struct(
        F.array(sanitized_dim_value(key)).alias("dimValues"),
        shaped_metric_value(value).alias("sum"),
        F.lit(1).alias("count"),
    )


def build_envelope_df(
    df: DataFrame,
    metric: str,
    namespace: str,
    dim_names: Sequence[str],
    key_col: str,
    value_col: str,
    time_str: str,
    order_col: str | None = None,
) -> DataFrame:
    """Aggregate (key, value) rows into ONE envelope row whose
    ``envelope_json`` column is byte-compatible with the reference's
    ``custom_metric_object`` (mqtt_data_collector.py:236-253).

    ``collect_list`` over the series is safe: series cardinality = the
    monitored-key registry, a small dimension even at 100 TB of traffic.

    ``order_col`` pins the series order INSIDE the aggregation: Spark
    does not guarantee collect_list preserves any upstream orderBy
    through the final single-partition exchange, so ordered callers
    (the Pulsar allowlist's registry order) collect (order, element)
    structs, array_sort them, and strip the key — deterministic on any
    number of input partitions.
    """
    if order_col is not None:
        collected = F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    series_element(F.col(key_col), F.col(value_col)).alias("e"),
                )
            )
        )
        series = F.transform(collected, lambda s: s["e"])
    else:
        series = F.collect_list(
            series_element(F.col(key_col), F.col(value_col))
        )
    env = df.agg(series.alias("series")).select(
        F.to_json(
            F.struct(
                F.lit(time_str).alias("time"),
                F.struct(
                    F.struct(
                        F.lit(metric).alias("metric"),
                        F.lit(namespace).alias("namespace"),
                        F.array(*[F.lit(d) for d in dim_names]).alias("dimNames"),
                        F.col("series").alias("series"),
                    ).alias("baseData")
                ).alias("data"),
            )
        ).alias("envelope_json"),
        F.size("series").alias("n_series"),
    )
    return env


@dataclass
class TokenCache:
    """Driver-local access-token file cache
    (send_data_to_azure_monitor.py:89-120)."""

    path: str
    initial_token: str = ""
    refresh: Callable[[], str] | None = None

    def ensure_exists(self) -> None:
        if not os.path.exists(self.path):
            with open(self.path, "x") as f:
                f.write(self.initial_token.rstrip())

    def read(self) -> str:
        self.ensure_exists()
        with open(self.path) as f:
            return f.read().rstrip()

    def refresh_and_store(self) -> str:
        if self.refresh is None:
            raise RuntimeError("no token refresh callback configured")
        token = self.refresh()
        with open(self.path, "w") as f:
            f.write(token)
        return token


Poster = Callable[[str, str], tuple[int, str]]
"""(json_body, bearer_token) -> (status_code, response_text)."""


@dataclass
class AzureMonitorSink:
    """foreachBatch sink with the reference's full retry/token policy.

    ``post`` and ``sleep`` are injected; production wiring passes a real
    HTTP poster and ``time.sleep``. Burst policy: up to 3 attempts per
    burst (send_data_to_azure_monitor.py:28-38), bursts separated by 300 s
    then 600 s (mqtt_data_collector.py:255-273). Token-refresh responses
    (TokenExpired/InvalidToken) consume an attempt and retry with the new
    token (send_data_to_azure_monitor.py:66-81).
    """

    post: Poster
    tokens: TokenCache
    burst_gaps_s: tuple[float, ...] = (300.0, 600.0)
    attempts_per_burst: int = 3
    sleep: Callable[[float], None] = _time.sleep
    sent: list[str] = field(default_factory=list)

    def _send_burst(self, body: str) -> bool:
        attempts_remaining = self.attempts_per_burst
        while attempts_remaining > 0:
            attempts_remaining -= 1
            status, text = self.post(body, self.tokens.read())
            if status == 200:
                return True
            try:
                code = json.loads(text)["Error"]["Code"]
            except Exception:
                code = None
            if code in ("TokenExpired", "InvalidToken"):
                self.tokens.refresh_and_store()
                continue  # retry with fresh token, attempt consumed
            return False  # unknown failure ends the burst immediately
            # (send_data_to_azure_monitor.py:82-88 returns False without
            # retrying; only token refresh recurses)
        return False

    def send(self, envelope_json: str) -> bool:
        if self._send_burst(envelope_json):
            self.sent.append(envelope_json)
            return True
        for gap in self.burst_gaps_s:
            self.sleep(gap)
            if self._send_burst(envelope_json):
                self.sent.append(envelope_json)
                return True
        return False

    def for_each_batch(
        self,
        metric: str,
        namespace: str,
        dim_names: Sequence[str],
        key_col: str,
        value_col: str,
        time_provider: Callable[[], str] | None = None,
    ) -> Callable[[DataFrame, int], None]:
        """Build the ``foreachBatch(fn)`` callable for a streaming query.

        The envelope timestamp is captured once per batch BEFORE any retry
        (original-window-label semantics, mqtt_data_collector.py:229)."""
        from datetime import datetime, timezone

        def _now() -> str:
            return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")

        provider = time_provider or _now

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            filtered = batch_df.filter(F.col(value_col).isNotNull())
            env = build_envelope_df(
                filtered, metric, namespace, dim_names, key_col, value_col,
                provider(),
            ).collect()
            if not env or env[0]["n_series"] == 0:
                return  # "No data to send to Azure" (:231-233)
            self.send(env[0]["envelope_json"])

        return fn


def oauth_client_credentials_refresh(
    tenant_id: str,
    client_id: str,
    client_secret: str,
    post_form: Callable[[str, dict[str, str]], str],
) -> Callable[[], str]:
    """Build a TokenCache ``refresh`` callback with the reference's exact
    token request (send_data_to_azure_monitor.py:100-120): POST the
    client-credentials grant to the tenant's oauth2 endpoint, return
    ``access_token`` from the JSON response. ``post_form(url, data) ->
    response_text`` is injected (tests pass a fake; production wires
    urllib/requests)."""

    def refresh() -> str:
        url = f"https://login.microsoftonline.com/{tenant_id}/oauth2/token"
        data = {
            "grant_type": "client_credentials",
            "client_id": client_id,
            "client_secret": client_secret,
            "resource": "https://monitoring.azure.com/",
        }
        return json.loads(post_form(url, data))["access_token"]

    return refresh
