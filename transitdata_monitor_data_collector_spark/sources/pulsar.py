"""Pulsar admin REST scan + discovery crawl.

Re-expresses the reference's snapshot analytics over the Pulsar admin API:

- per-topic stats GET (``src/pulsar_data_collector.py:81-96``:
  ``{ADMIN_URL}/admin/v2/persistent/{ns}/{topic}/stats`` → nested JSON);
- the catalog crawl (``src/stats_of_all_topics.sh:19-30``,
  ``src/topics_with_big_backlog.sh:19-29``: namespaces → topics → stats);
- the metric allowlists (``src/pulsar_data_collector.py:21-52``) as small
  dimension tables for broadcast semi-joins.

HTTP is behind an injectable ``fetcher(url) -> str`` so tests (and offline
runs) provide canned JSON; the default uses urllib. Stats JSON parses
through an explicit permissive StructType with a corrupt-record column —
the reference has NO validation here (KeyError would propagate,
``pulsar_data_collector.py:170,191-194``); we keep bad documents visible
instead of crashing.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "TOPIC_STATS_SCHEMA",
    "MSG_RATE_IN_TOPICS",
    "MSG_RATE_OUT_TOPICS",
    "STORAGE_SIZE_TOPICS",
    "SUBSCRIPTION_TOPICS",
    "HFP_SUBSCRIPTION",
    "default_fetcher",
    "read_topic_stats",
    "discover_topics",
    "allowlist_df",
]

Fetcher = Callable[[str], str]

# Allowlists from pulsar_data_collector.py:21-52 — the monitored registry.
MSG_RATE_IN_TOPICS = (
    "hfp-mqtt-raw/v2",
    "hfp-mqtt-raw/apc",
    "hfp-mqtt-raw/partial-apc",
    "hfp-mqtt-raw-deduplicated/v2",
    "hfp-mqtt-raw-deduplicated/apc",
    "hfp-mqtt-raw-deduplicated/partial-apc",
    "hfp/v2",
    "hfp/expanded-apc",
    "hfp/expanded-apc-mqtt-backfeed",
    "gtfs-rt/feedmessage-vehicleposition",
    "metro-ats-mqtt-raw/metro-estimate",
    "metro-ats-mqtt-raw-deduplicated/metro-estimate",
    "source-metro-ats/metro-estimate",
    "source-pt-roi/arrival",
    "source-pt-roi/departure",
    "internal-messages/pubtrans-stop-estimate",
    "internal-messages/feedmessage-tripupdate",
    "gtfs-rt/feedmessage-tripupdate",
    "internal-messages/stop-cancellation",
)
MSG_RATE_OUT_TOPICS = (
    "hfp-mqtt-raw/v2",
    "hfp/passenger-count",
    "gtfs-rt/feedmessage-vehicleposition",
    "gtfs-rt/feedmessage-tripupdate",
)
STORAGE_SIZE_TOPICS = ("hfp/v2", "gtfs-rt/feedmessage-vehicleposition")
SUBSCRIPTION_TOPICS = ("hfp/v2",)
HFP_SUBSCRIPTION = "transitdata_partial_apc_expander_combiner_hfp"

# Nested stats schema — the fields the reference reads
# (pulsar_data_collector.py:167-198, stats_of_all_topics.sh:30) plus the
# subscriptions map for msgBacklog.
TOPIC_STATS_SCHEMA = T.StructType(
    [
        T.StructField("msgRateIn", T.DoubleType(), True),
        T.StructField("msgRateOut", T.DoubleType(), True),
        T.StructField("storageSize", T.LongType(), True),
        T.StructField("backlogSize", T.LongType(), True),
        T.StructField(
            "subscriptions",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("msgBacklog", T.LongType(), True),
                        T.StructField("msgRateOut", T.DoubleType(), True),
                    ]
                ),
            ),
            True,
        ),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def default_fetcher(url: str) -> str:  # pragma: no cover - network path
    from urllib.request import urlopen

    with urlopen(url, timeout=60) as resp:
        return resp.read().decode("utf-8")


def read_topic_stats(
    spark: SparkSession,
    admin_url: str,
    namespace: str,
    topics: Sequence[str],
    fetcher: Fetcher = default_fetcher,
) -> DataFrame:
    """Fetch per-topic stats JSON and parse into a typed DataFrame.

    The topic registry is tiny (dozens), so fetches run driver-side (like
    the reference's sequential loop, pulsar_data_collector.py:71-77);
    failures yield a row with NULL stats so the membership join downstream
    can still see the topic (``is not None`` filter analog :72-73).
    """
    raw: list[tuple[str, str | None]] = []
    for t in topics:
        url = f"{admin_url}/admin/v2/persistent/{namespace}/{t}/stats"
        try:
            raw.append((t, fetcher(url)))
        except Exception:
            raw.append((t, None))
    df = spark.createDataFrame(raw, "topic string, stats_json string")
    parsed = df.withColumn(
        "stats",
        F.from_json(
            "stats_json",
            TOPIC_STATS_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    return parsed.select(
        "topic",
        F.col("stats.msgRateIn").alias("msgRateIn"),
        F.col("stats.msgRateOut").alias("msgRateOut"),
        F.col("stats.storageSize").alias("storageSize"),
        F.col("stats.backlogSize").alias("backlogSize"),
        F.col("stats.subscriptions").alias("subscriptions"),
        F.col("stats._corrupt_record").alias("_corrupt_record"),
    )


def discover_topics(
    admin_url: str,
    tenant: str = "public",
    fetcher: Fetcher = default_fetcher,
) -> list[str]:
    """Catalog crawl: list namespaces, then persistent topics per namespace
    (stats_of_all_topics.sh:19-30) — the SHOW TABLES analog."""
    namespaces = json.loads(fetcher(f"{admin_url}/admin/v2/namespaces/{tenant}"))
    topics: list[str] = []
    for ns in namespaces:
        topics.extend(
            json.loads(fetcher(f"{admin_url}/admin/v2/persistent/{ns}"))
        )
    return topics


def allowlist_df(spark: SparkSession, topics: Sequence[str]) -> DataFrame:
    """Allowlist as a broadcastable dimension with registry order preserved
    (series emitted in allowlist order, pulsar_data_collector.py:169)."""
    return spark.createDataFrame(
        [(t, i) for i, t in enumerate(topics)], "topic string, registry_order int"
    )


def pulsar_metric_envelopes(
    stats: DataFrame, time_str: str
) -> dict[str, DataFrame]:
    """The reference's full Pulsar->Azure flow (pulsar_data_collector.py:
    98-125): four envelope DataFrames, one per metric, each restricted to
    its allowlist IN REGISTRY ORDER with the reference's exact quirks:

    - Msg Rate In / Msg Rate Out / Storage Size: dimValue = topic name;
    - Msg Backlog: reads subscriptions[HFP_SUBSCRIPTION].msgBacklog of the
      SUBSCRIPTION_TOPICS and — reference quirk, :196-205 — the dimValue
      is the METRIC FIELD NAME ('msgBacklog'), not the topic.

    Join to the allowlist is a broadcast inner join (J1); series order is
    the allowlist order (:169).
    """
    from transitdata_monitor_data_collector_spark.sinks.azure import (
        build_envelope_df,
    )

    spark = stats.sparkSession

    def allowlisted(metric_col: str, topics) -> DataFrame:
        allow = allowlist_df(spark, topics)
        return (
            stats.join(F.broadcast(allow), "topic")
            .filter(F.col(metric_col).isNotNull())
            .orderBy("registry_order")
        )

    out: dict[str, DataFrame] = {}
    for metric_name, col, topics in (
        ("Msg Rate In", "msgRateIn", MSG_RATE_IN_TOPICS),
        ("Msg Rate Out", "msgRateOut", MSG_RATE_OUT_TOPICS),
        ("Storage Size", "storageSize", STORAGE_SIZE_TOPICS),
    ):
        out[metric_name] = build_envelope_df(
            allowlisted(col, topics),
            metric=metric_name,
            namespace="Pulsar",
            dim_names=["Topic"],
            key_col="topic",
            value_col=col,
            time_str=time_str,
            # registry order enforced INSIDE the aggregation: an upstream
            # orderBy is not guaranteed to survive collect_list's final
            # exchange on multi-partition inputs
            order_col="registry_order",
        )
    backlog = allowlisted("subscriptions", SUBSCRIPTION_TOPICS).select(
        "registry_order",
        F.lit("msgBacklog").alias("dim_key"),  # reference quirk (:196-205)
        F.col("subscriptions")[HFP_SUBSCRIPTION]["msgBacklog"]
        .cast("double")
        .alias("backlog"),
    )
    out["Msg Backlog"] = build_envelope_df(
        backlog,
        metric="Msg Backlog",
        namespace="Pulsar",
        dim_names=["Topic"],
        key_col="dim_key",
        value_col="backlog",
        time_str=time_str,
        order_col="registry_order",
    )
    return out
