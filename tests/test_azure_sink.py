"""Azure Monitor sink tests: envelope byte-format vs the reference's
custom_metric_object (mqtt_data_collector.py:236-253), series shaping rules
(get_series_array :285-306), and the retry/token-refresh policy
(send_data_to_azure_monitor.py:28-88, mqtt_data_collector.py:255-273)."""

from __future__ import annotations

import json

from transitdata_monitor_data_collector_spark.sinks.azure import (
    AzureMonitorSink,
    TokenCache,
    build_envelope_df,
    series_element,
)

TIME = "2024-05-01T12:00:00"


def _env(spark, rows):
    df = spark.createDataFrame(rows, "topic string, rate double")
    out = build_envelope_df(
        df, "Msg Count", "MQTT", ["Topic"], "topic", "rate", TIME
    ).collect()[0]
    return json.loads(out["envelope_json"]), out["n_series"]


def test_envelope_structure_matches_reference(spark):
    doc, n = _env(spark, [("hfp/a", 3.0)])
    assert n == 1
    assert doc == {
        "time": TIME,
        "data": {
            "baseData": {
                "metric": "Msg Count",
                "namespace": "MQTT",
                "dimNames": ["Topic"],
                "series": [{"dimValues": ["hfp/a"], "sum": 3.0, "count": 1}],
            }
        },
    }


def test_series_shaping_rules(spark):
    doc, _ = _env(
        spark,
        [
            ("t1", 3.14159),   # round to 2 -> 3.14
            ("t2", -2.5),      # abs
            ("t3", 123.456),   # >10 -> whole number
            ("a/#/b+c", 1.0),  # sanitize # -> *, + -> ^
        ],
    )
    series = {s["dimValues"][0]: s for s in doc["data"]["baseData"]["series"]}
    assert series["t1"]["sum"] == 3.14
    assert series["t2"]["sum"] == 2.5
    assert series["t3"]["sum"] == 123.0
    assert "a/*/b^c" in series
    assert all(s["count"] == 1 for s in series.values())


def make_sink(tmp_path, responses, refreshes=None):
    calls = []
    sleeps = []
    resp_iter = iter(responses)

    def post(body, token):
        calls.append((body, token))
        return next(resp_iter)

    refreshed = iter(refreshes or [])
    tokens = TokenCache(
        path=str(tmp_path / "token.txt"),
        initial_token="tok0",
        refresh=lambda: next(refreshed),
    )
    sink = AzureMonitorSink(
        post=post, tokens=tokens, sleep=sleeps.append
    )
    return sink, calls, sleeps


def test_send_success_first_try(tmp_path):
    sink, calls, sleeps = make_sink(tmp_path, [(200, "ok")])
    assert sink.send("{}") is True
    assert len(calls) == 1
    assert calls[0][1] == "tok0"
    assert sleeps == []


def test_token_refresh_on_expired(tmp_path):
    # send_data_to_azure_monitor.py:66-81: refresh consumes an attempt,
    # retry uses the new token from the file cache.
    body_expired = json.dumps({"Error": {"Code": "TokenExpired"}})
    sink, calls, sleeps = make_sink(
        tmp_path, [(401, body_expired), (200, "ok")], refreshes=["tok1"]
    )
    assert sink.send("{}") is True
    assert [t for _, t in calls] == ["tok0", "tok1"]


def test_token_refresh_attempts_bounded(tmp_path):
    # 3 attempts per burst; always-expired gives exactly 3 posts per burst
    body = json.dumps({"Error": {"Code": "InvalidToken"}})
    sink, calls, sleeps = make_sink(
        tmp_path,
        [(401, body)] * 9,
        refreshes=[f"t{i}" for i in range(1, 10)],  # refresh after each fail
    )
    assert sink.send("{}") is False
    assert len(calls) == 9  # 3 bursts x 3 attempts
    assert sleeps == [300.0, 600.0]  # mqtt_data_collector.py:255-273


def test_unknown_failure_ends_burst_immediately(tmp_path):
    # send_data_to_azure_monitor.py:82-88: non-token errors do not retry
    # within the burst; outer schedule still runs 3 bursts.
    sink, calls, sleeps = make_sink(
        tmp_path, [(500, "oops"), (500, "oops"), (200, "ok")]
    )
    assert sink.send("{}") is True
    assert len(calls) == 3
    assert sleeps == [300.0, 600.0]


def test_token_file_created_and_reused(tmp_path):
    sink, calls, _ = make_sink(tmp_path, [(200, "ok")])
    sink.send("{}")
    assert (tmp_path / "token.txt").read_text() == "tok0"


def test_for_each_batch_skips_empty(spark, tmp_path):
    sink, calls, _ = make_sink(tmp_path, [(200, "ok")])
    fn = sink.for_each_batch(
        "Msg Count", "MQTT", ["Topic"], "topic", "rate",
        time_provider=lambda: TIME,
    )
    empty = spark.createDataFrame([], "topic string, rate double")
    fn(empty, 0)
    assert calls == []  # "No data to send to Azure" (:231-233)


def test_for_each_batch_filters_null_and_posts(spark, tmp_path):
    sink, calls, _ = make_sink(tmp_path, [(200, "ok")])
    fn = sink.for_each_batch(
        "Msg Count", "MQTT", ["Topic"], "topic", "rate",
        time_provider=lambda: TIME,
    )
    batch = spark.createDataFrame(
        [("a", 1.0), ("b", None)], "topic string, rate double"
    )
    fn(batch, 0)
    doc = json.loads(calls[0][0])
    assert [s["dimValues"] for s in doc["data"]["baseData"]["series"]] == [["a"]]


def test_envelope_series_order_survives_multipartition_input(spark):
    """ADVICE regression: collect_list does not guarantee upstream sort
    order through the final aggregation exchange. order_col pins the
    series order inside the aggregation — verify over a deliberately
    multi-partition, shuffled input."""
    import random

    rows = [(i, f"topic-{i}", float(i)) for i in range(50)]
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(
        rows, "registry_order long, topic string, v double"
    ).repartition(16)
    out = build_envelope_df(
        df,
        metric="M",
        namespace="NS",
        dim_names=["Topic"],
        key_col="topic",
        value_col="v",
        time_str="2024-01-01T00:00:00Z",
        order_col="registry_order",
    ).collect()[0]
    env = json.loads(out["envelope_json"])
    names = [s["dimValues"][0] for s in env["data"]["baseData"]["series"]]
    assert names == [f"topic-{i}" for i in range(50)]
