"""Pulsar admin REST source tests: stats JSON parsing through the explicit
schema (pulsar_data_collector.py:81-96), nested subscription backlog access
(:191-194), fetch-failure tolerance (:72-77), and the catalog crawl
(stats_of_all_topics.sh:19-30)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.sources.pulsar import (
    HFP_SUBSCRIPTION,
    MSG_RATE_IN_TOPICS,
    MSG_RATE_OUT_TOPICS,
    STORAGE_SIZE_TOPICS,
    allowlist_df,
    discover_topics,
    read_topic_stats,
)

ADMIN = "http://pulsar:8080"
NS = "public/default"

STATS = {
    "hfp/v2": {
        "msgRateIn": 1234.5678,
        "msgRateOut": 2345.1,
        "storageSize": 9_876_543_210,
        "backlogSize": 1_500_000_000,
        "subscriptions": {
            HFP_SUBSCRIPTION: {"msgBacklog": 42, "msgRateOut": 11.5},
            "other_sub": {"msgBacklog": 7, "msgRateOut": 0.1},
        },
    },
    "gtfs-rt/feedmessage-tripupdate": {
        "msgRateIn": 5.5,
        "msgRateOut": 0.0,
        "storageSize": 1000,
        "backlogSize": 10,
        "subscriptions": {},
    },
}


def fake_fetcher(url):
    for topic, doc in STATS.items():
        if f"/{NS}/{topic}/stats" in url:
            return json.dumps(doc)
    raise OSError(f"unexpected url {url}")


def test_read_topic_stats_parses_nested_schema(spark):
    df = read_topic_stats(
        spark, ADMIN, NS, ["hfp/v2", "gtfs-rt/feedmessage-tripupdate"], fake_fetcher
    )
    rows = {r["topic"]: r for r in df.collect()}
    assert rows["hfp/v2"]["msgRateIn"] == 1234.5678
    assert rows["hfp/v2"]["storageSize"] == 9_876_543_210
    # P2 nested access: subscriptions[<sub>].msgBacklog
    backlog = (
        df.filter(F.col("topic") == "hfp/v2")
        .select(
            F.col("subscriptions")[HFP_SUBSCRIPTION]["msgBacklog"].alias("b")
        )
        .collect()[0]["b"]
    )
    assert backlog == 42


def test_fetch_failure_yields_null_stats_row(spark):
    df = read_topic_stats(spark, ADMIN, NS, ["hfp/v2", "missing/topic"], fake_fetcher)
    rows = {r["topic"]: r for r in df.collect()}
    assert rows["missing/topic"]["msgRateIn"] is None
    # the None-measurement filter (P3) then drops it:
    assert df.filter(F.col("msgRateIn").isNotNull()).count() == 1


def test_corrupt_json_lands_in_corrupt_record(spark):
    df = read_topic_stats(
        spark, ADMIN, NS, ["bad"], lambda url: "{not valid json"
    )
    row = df.collect()[0]
    assert row["msgRateIn"] is None
    assert row["_corrupt_record"] is not None


def test_discover_topics_crawl():
    def fetcher(url):
        if url.endswith("/namespaces/public"):
            return json.dumps(["public/default", "public/functions"])
        if url.endswith("/persistent/public/default"):
            return json.dumps(["persistent://public/default/t1"])
        if url.endswith("/persistent/public/functions"):
            return json.dumps(["persistent://public/functions/t2"])
        raise AssertionError(url)

    topics = discover_topics(ADMIN, "public", fetcher)
    assert topics == [
        "persistent://public/default/t1",
        "persistent://public/functions/t2",
    ]


def test_allowlists_match_reference():
    # pulsar_data_collector.py:21-52
    assert len(MSG_RATE_IN_TOPICS) == 19
    assert len(MSG_RATE_OUT_TOPICS) == 4
    assert STORAGE_SIZE_TOPICS == ("hfp/v2", "gtfs-rt/feedmessage-vehicleposition")


def test_allowlist_df_preserves_registry_order(spark):
    df = allowlist_df(spark, MSG_RATE_OUT_TOPICS)
    rows = df.orderBy("registry_order").collect()
    assert [r["topic"] for r in rows] == list(MSG_RATE_OUT_TOPICS)


def test_pulsar_metric_envelopes(spark):
    import json as _json

    from transitdata_monitor_data_collector_spark.sources.pulsar import (
        pulsar_metric_envelopes,
    )

    stats = read_topic_stats(
        spark, ADMIN, NS, ["hfp/v2", "gtfs-rt/feedmessage-tripupdate"], fake_fetcher
    )
    envs = pulsar_metric_envelopes(stats, "2024-05-01T12:00:00Z")
    assert set(envs) == {"Msg Rate In", "Msg Rate Out", "Storage Size", "Msg Backlog"}

    rate_in = _json.loads(envs["Msg Rate In"].collect()[0]["envelope_json"])
    base = rate_in["data"]["baseData"]
    assert base["metric"] == "Msg Rate In"
    assert base["namespace"] == "Pulsar"
    series = {s["dimValues"][0]: s["sum"] for s in base["series"]}
    # 1234.5678 -> round2 -> >10 -> whole (pulsar_data_collector.py:172-176)
    assert series["hfp/v2"] == 1235.0
    # 5.5 stays 2-decimal
    assert series["gtfs-rt/feedmessage-tripupdate"] == 5.5

    backlog = _json.loads(envs["Msg Backlog"].collect()[0]["envelope_json"])
    bseries = backlog["data"]["baseData"]["series"]
    # reference quirk: dimValue is the metric field name, not the topic
    assert bseries == [{"dimValues": ["msgBacklog"], "sum": 42.0, "count": 1}]


def test_oauth_refresh_request_shape(tmp_path):
    import json as _json

    from transitdata_monitor_data_collector_spark.sinks.azure import (
        TokenCache,
        oauth_client_credentials_refresh,
    )

    posts = []

    def post_form(url, data):
        posts.append((url, data))
        return _json.dumps({"access_token": "fresh-token", "expires_in": 3599})

    refresh = oauth_client_credentials_refresh(
        "tenant-1", "client-1", "secret-1", post_form
    )
    cache = TokenCache(path=str(tmp_path / "tok"), initial_token="old", refresh=refresh)
    cache.ensure_exists()
    assert cache.refresh_and_store() == "fresh-token"
    assert cache.read() == "fresh-token"
    url, data = posts[0]
    assert url == "https://login.microsoftonline.com/tenant-1/oauth2/token"
    assert data["grant_type"] == "client_credentials"
    assert data["resource"] == "https://monitoring.azure.com/"
