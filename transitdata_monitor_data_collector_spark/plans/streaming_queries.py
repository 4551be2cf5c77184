"""Streaming queries in the registry: real Structured Streaming runs
(file-replay source, processAllAvailable replay, memory sink) whose final output
is deterministic, so the windowed/counter jobs get full DuckDB oracles —
the stream result must equal the batch computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark.sql.window import Window as W

from transitdata_monitor_data_collector_spark.plans import register
from transitdata_monitor_data_collector_spark.plans.relational import (
    _IVM_ORACLE,
)
from transitdata_monitor_data_collector_spark.plans.monitoring import (
    _ALERT_FOR_DURATION_ORACLE,
    _OFFSET_WOW_ORACLE,
    _SLO_BURN_ORACLE,
    BROKER_SQL,
    DASHBOARD_FILTERS,
    TOPIC_SQL,
    _FANOUT_CTE,
    _HOLT_C,
    _HOLT_D,
    _HOLT_HS,
    _HOLT_K,
    _MSGS_CTE,
    _holt_oracle,
)
from transitdata_monitor_data_collector_spark.streaming import jobs


def _message_stream(spark, sf_dir):
    stream = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    return stream.select(
        F.expr(BROKER_SQL).alias("broker"),
        F.expr(TOPIC_SQL).alias("topic"),
        "ts",
        "event_id",
        # REPLAY-HARNESS shape fix (registry twins only; production jobs
        # in streaming/jobs.py are untouched): the single-file replay
        # source yields ONE scan partition per micro-batch, which pins
        # the CPU-heavy wildcard fan-out (20 regex matches per row) to
        # one core before the stateful agg's own shuffle (profiled r11:
        # a 3.5 s single-task stage). Spreading the narrow projected
        # rows costs one tiny exchange the keyed agg shuffle would pay
        # anyway; a real deployment's per-trigger input arrives as many
        # splits and this many-partition repartition is simply the
        # pre-shuffle width it already has.
    ).repartition(spark.sparkContext.defaultParallelism)


@register(
    "streaming_windowed_rate",
    oracle=f"""
    WITH {_MSGS_CTE},
    {_FANOUT_CTE}
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
           broker, topic_filter, count(*) AS n,
           round(count(*) / 60.0, 6) AS rate_msg_s
    FROM fanned GROUP BY 1, 2, 3
    ORDER BY window_start, broker, topic_filter
    """,
    doc="T1/A1/A2 as a REAL streaming run: file-replay -> watermark -> "
    "windowed fan-out rate -> memory sink (complete mode); the "
    "processAllAvailable replay makes the final table equal the batch "
    "answer.",
    tags=("streaming",),
)
def streaming_windowed_rate(spark, sf_dir):
    rates = jobs.windowed_rate_job(_message_stream(spark, sf_dir), DASHBOARD_FILTERS)
    return jobs.run_to_memory(spark, rates, output_mode="complete").orderBy(
        "window_start", "broker", "topic_filter"
    )


@register(
    "streaming_counter_totals",
    oracle=f"""
    WITH {_MSGS_CTE},
    {_FANOUT_CTE}
    SELECT broker, topic_filter, count(*) AS messages_received_total
    FROM fanned GROUP BY 1, 2 ORDER BY broker, topic_filter
    """,
    doc="A3 cumulative counter as a streaming update-mode job; final state "
    "per key equals the batch count.",
    tags=("streaming",),
)
def streaming_counter_totals(spark, sf_dir):
    counters = jobs.cumulative_counter_job(
        _message_stream(spark, sf_dir), DASHBOARD_FILTERS
    )
    mem = jobs.run_to_memory(spark, counters, output_mode="update")
    # update mode emits one row per key per micro-batch; keep the latest
    return (
        mem.groupBy("broker", "topic_filter")
        .agg(F.max("messages_received_total").alias("messages_received_total"))
        .orderBy("broker", "topic_filter")
    )


@register(
    "streaming_dedup_within_watermark",
    oracle=f"""
    WITH {_MSGS_CTE}
    SELECT broker, count(DISTINCT topic) AS n_unique_topics
    FROM msgs GROUP BY broker ORDER BY broker
    """,
    doc="T8 dropDuplicatesWithinWatermark over the replayed stream "
    "(raw -> raw-deduplicated). WHICH duplicate survives is arrival-order "
    "dependent, but the registered aggregate (surviving rows per broker) "
    "is survivor-invariant, and the deterministic single-file replay "
    "admits no watermark leak — so it must equal the batch distinct-topic "
    "count per broker.",
    tags=("streaming", "dedup"),
)
def streaming_dedup_within_watermark(spark, sf_dir):
    deduped = jobs.dedup_within_watermark_job(
        _message_stream(spark, sf_dir), keys=("broker", "topic")
    )
    mem = jobs.run_to_memory(spark, deduped, output_mode="append")
    return mem.groupBy("broker").agg(F.count("*").alias("n_unique_topics")).orderBy(
        "broker"
    )


@register(
    "streaming_stream_join",
    oracle="""
    SELECT l.user_id, count(*) AS n_pairs
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    doc="T7 watermarked stream-stream inner join (click->purchase within "
    "1 h per user), run as a REAL streaming job over the file-replay "
    "source; the final joined set equals the batch interval join.",
    tags=("streaming", "join"),
)
def streaming_stream_join(spark, sf_dir):
    raw = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    clicks = raw.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = raw.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = jobs.stream_stream_join_job(clicks, purchases)
    mem = jobs.run_to_memory(spark, joined, output_mode="append")
    return (
        mem.groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "streaming_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      -- total order (ts, event_id): ts-only tie order is engine-
      -- nondeterministic and can split a same-ts tie group across
      -- session boundaries; Spark's session_window always merges them
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM islands GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="T7 session windows as a REAL streaming run: dynamic-gap windows "
    "merging in the state store (watermark-bounded), replayed to "
    "exhaustion; the final table equals the batch session_window "
    "aggregation and the gaps-and-islands oracle (same SQL as the batch "
    "`session_windows` query).",
    tags=("streaming", "window"),
)
def streaming_session_windows(spark, sf_dir):
    raw = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    sessions = jobs.session_window_job(raw.filter(F.col("user_id") < 10))
    return jobs.run_to_memory(spark, sessions, output_mode="complete").orderBy(
        "user_id", "session_start"
    )


@register(
    "streaming_stateful_counter",
    oracle=f"""
    WITH {_MSGS_CTE},
    {_FANOUT_CTE}
    SELECT broker, topic_filter, count(*) AS messages_received_total
    FROM fanned GROUP BY 1, 2 ORDER BY broker, topic_filter
    """,
    doc="UD4: the applyInPandasWithState CUSTOM stateful counter "
    "(streaming/jobs.py:stateful_counter_job — one int64 of user-managed "
    "state per (broker, topic_filter), the literal analog of the "
    "reference's Micrometer counter objects, "
    "MqttTopicMonitorListener.java:73-92) driven through the same replay "
    "harness; the final per-key state must equal the batch fan-out count "
    "(same oracle as streaming_counter_totals).",
    tags=("streaming", "stateful"),
)
def streaming_stateful_counter(spark, sf_dir):
    counters = jobs.stateful_counter_job(
        _message_stream(spark, sf_dir), DASHBOARD_FILTERS
    )
    mem = jobs.run_to_memory(spark, counters, output_mode="update")
    # update mode emits one row per key per micro-batch; keep the latest
    return (
        mem.groupBy("broker", "topic_filter")
        .agg(F.max("messages_received_total").alias("messages_received_total"))
        .orderBy("broker", "topic_filter")
    )


@register(
    "streaming_tws_counter",
    oracle=f"""
    WITH {_MSGS_CTE},
    {_FANOUT_CTE}
    SELECT broker, topic_filter,
           count(*) AS messages_received_total,
           CAST(epoch_us(min(ts)) AS BIGINT) AS first_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS last_us
    FROM fanned GROUP BY 1, 2 ORDER BY broker, topic_filter
    """,
    doc="UD4 on Spark 4's transformWithStateInPandas (successor arbitrary-"
    "state API): per-(broker, topic_filter) meter — count + first/last "
    "event-time micros in one ValueState, RocksDB state store "
    "(streaming/jobs.py:tws_meter_job). Every maintained quantity is "
    "commutative, so the final state equals the batch fan-out aggregate "
    "regardless of micro-batch boundaries. When google.protobuf is not "
    "installed, the job activates the vendored pure-Python wire-format "
    "runtime (vendor/pbshim) and ships it to workers — the JVM state "
    "server parsing those bytes with protobuf-java is the differential "
    "check on the shim.",
    tags=("streaming", "stateful", "tws"),
)
def streaming_tws_counter(spark, sf_dir):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        meters = jobs.tws_meter_job(
            _message_stream(spark, sf_dir), DASHBOARD_FILTERS
        )
        mem = jobs.run_to_memory(spark, meters, output_mode="update")
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    # update mode re-emits a key's meter each micro-batch; keep the final
    return (
        mem.groupBy("broker", "topic_filter")
        .agg(
            F.max("messages_received_total").alias("messages_received_total"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
        .orderBy("broker", "topic_filter")
    )


@register(
    "streaming_gauge_last",
    oracle=f"""
    WITH {_MSGS_CTE}
    SELECT broker, topic AS last_topic, ts AS last_ts
    FROM (
      SELECT broker, topic, ts,
             row_number() OVER (PARTITION BY broker
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM msgs
    ) WHERE rn = 1 ORDER BY broker
    """,
    doc="A5 last-value gauge per broker as a streaming update-mode job "
    "(mqtt_connected / last-scrape analog, GtfsRtMetricsRegistry.java:51,56); "
    "event_id breaks timestamp ties deterministically on both engines.",
    tags=("streaming", "gauge"),
)
def streaming_gauge_last(spark, sf_dir):
    stream = _message_stream(spark, sf_dir)
    gauges = stream.groupBy("broker").agg(
        F.max_by("topic", F.struct("ts", "event_id")).alias("last_topic"),
        F.max("ts").alias("last_ts"),
    )
    mem = jobs.run_to_memory(spark, gauges, output_mode="complete")
    return mem.orderBy("broker")


@register(
    "streaming_histogram_buckets",
    oracle="""
    WITH bucketed AS (
        SELECT event_type,
               CASE WHEN value <= 1.0 THEN 0 WHEN value <= 5.0 THEN 1
                    WHEN value <= 10.0 THEN 2 WHEN value <= 50.0 THEN 3
                    WHEN value <= 100.0 THEN 4 ELSE 5 END AS bucket_idx,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT event_type, bucket_idx, le
        FROM (SELECT DISTINCT event_type FROM events),
             (VALUES (0, '1'), (1, '5'), (2, '10'), (3, '50'), (4, '100'),
                     (5, '+Inf')) b(bucket_idx, le)
    )
    SELECT g.event_type, g.le,
           CAST(sum(coalesce(n, 0)) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_count
    FROM grid g LEFT JOIN bucketed USING (event_type, bucket_idx)
    ORDER BY g.event_type, g.bucket_idx
    """,
    doc="The live path of the Prometheus histogram: per-(event_type, "
    "le-bucket) counts maintained as a STREAMING aggregation (complete "
    "mode — the state is 6 counters per meter, exactly what a "
    "DistributionSummary keeps resident), then densified into the "
    "cumulative le series at scrape time — splitting the work the way "
    "a real exporter does (hot counting in the stream, cheap "
    "exposition rendering at the scrape). Final table equals the "
    "batch prometheus_histogram_buckets (same oracle).",
    tags=("streaming", "agg"),
)
def streaming_histogram_buckets(spark, sf_dir):
    from transitdata_monitor_data_collector_spark.plans.monitoring import (
        _HISTO_LES,
    )

    stream = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    bucket_idx = F.lit(len(_HISTO_LES))
    for i, le in reversed(list(enumerate(_HISTO_LES))):
        bucket_idx = F.when(F.col("value") <= le, i).otherwise(bucket_idx)
    bucketed = stream.groupBy(
        "event_type", bucket_idx.alias("bucket_idx")
    ).count()
    mem = jobs.run_to_memory(spark, bucketed, output_mode="complete")
    # break lineage: grid below re-derives from mem, and a self-join on
    # the same memory-sink relation trips ambiguous-attribute resolution
    mem = mem.localCheckpoint()

    # scrape-time rendering (batch post-process over 30 rows)
    les = [*[str(int(v)) for v in _HISTO_LES], "+Inf"]
    grid_b = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("bucket_idx"), F.lit(le).alias("le"))
                for i, le in enumerate(les)
            ]
        )
    )
    grid = (
        mem.select("event_type")
        .distinct()
        .select("event_type", grid_b.alias("b"))
        .select("event_type", "b.bucket_idx", "b.le")
    )
    from pyspark.sql.window import Window as W

    wcum = (
        W.partitionBy("event_type")
        .orderBy("bucket_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(mem, ["event_type", "bucket_idx"], "left")
        .select(
            "event_type",
            "le",
            "bucket_idx",
            F.coalesce(F.col("count"), F.lit(0)).alias("n"),
        )
        .withColumn(
            "cumulative_count", F.sum("n").over(wcum).cast("long")
        )
        .select("event_type", "le", "cumulative_count")
        .orderBy("event_type", "bucket_idx")
    )


@register(
    "streaming_bitmap_distinct",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
    doc="EXACT streaming distinct: daily unique users maintained "
    "incrementally as update-mode bitmap state (bit_or over "
    "(day, user_id/32) words — idempotent, mergeable, domain/32 longs "
    "per day regardless of traffic); the replayed final state's "
    "popcounts must equal the batch COUNT(DISTINCT). Update mode "
    "re-emits a key's word whenever a bit lands, so the memory sink "
    "keeps the max (bits only ever turn on — the nonnegative word "
    "value is monotone).",
    tags=("streaming", "sketch"),
)
def streaming_bitmap_distinct(spark, sf_dir):
    events = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    words = jobs.bitmap_distinct_job(events)
    mem = jobs.run_to_memory(spark, words, output_mode="update")
    final = mem.groupBy("day", "word_i").agg(F.max("mask").alias("mask"))
    return (
        final.groupBy("day")
        .agg(F.sum(F.bit_count("mask")).cast("long").alias("n_users"))
        .orderBy("day")
    )


def _cms_user_col_sql(tok_expr: str, row: int, w: int = 512) -> str:
    return (
        f"(('0x' || substr(md5({tok_expr} || '#{row}'), 1, 8))::BIGINT % {w})"
    )


@register(
    "streaming_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT CAST(user_id AS VARCHAR) AS t FROM events),
    cells AS (
      {" UNION ALL ".join(
        f"SELECT {r} AS row_i, {_cms_user_col_sql('t', r)} AS col_i, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 2"
        for r in range(4)
      )}
    ),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id LIMIT 20
    )
    SELECT e.user_id, e.exact_n,
           min(c.cnt) AS cms_estimate,
           min(c.cnt) - e.exact_n AS overcount
    FROM exact e
    JOIN cells c ON {" OR ".join(
        f"(c.row_i = {r} AND "
        f"c.col_i = {_cms_user_col_sql('CAST(e.user_id AS VARCHAR)', r)})"
        for r in range(4)
    )}
    GROUP BY e.user_id, e.exact_n
    ORDER BY e.exact_n DESC, e.user_id
    """,
    doc="The Count-Min sketch maintained as LIVE streaming state (the "
    "streaming twin of sketch_countmin_heavy_hitters, same d=4 x w=512 "
    "md5 layout over user traffic): every replayed event increments d "
    "hashed cells in update-mode keyed state — constant 2,048 counters "
    "regardless of traffic — and the final sketch must equal the "
    "batch-built one, cell for cell (counts are monotone, so max-per-"
    "cell recovers the final state from the update-mode sink). The "
    "top-20 exact heavy hitters probe the sketch; estimate >= exact "
    "always, overcount bounded by hash-collision mass. This is the "
    "live-dashboard form: rankings served from the sketch while the "
    "exact aggregate would need the full key domain in state.",
    tags=("streaming", "sketch", "approx"),
)
def streaming_cms_heavy_hitters(spark, sf_dir):
    from transitdata_monitor_data_collector_spark.plans import table

    events = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    mem = jobs.run_to_memory(
        spark, jobs.cms_cells_job(events), output_mode="update"
    )
    cells = mem.groupBy("row_i", "col_i").agg(F.max("cnt").alias("cnt"))

    def cms_col(tok, row_i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(tok, F.lit("#"), row_i.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 512
        )

    exact = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(20)
    )
    probe = exact.select(
        "user_id",
        "exact_n",
        F.explode(F.array(*[F.lit(r) for r in range(4)])).alias("row_i"),
    ).select(
        "user_id",
        "exact_n",
        "row_i",
        cms_col(F.col("user_id").cast("string"), F.col("row_i")).alias(
            "col_i"
        ),
    )
    return (
        probe.join(cells, ["row_i", "col_i"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
        .select(
            "user_id",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n"))
            .cast("long")
            .alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), "user_id")
    )


@register(
    "streaming_holt_forecast",
    oracle=_holt_oracle(),
    doc="The Holt linear-trend forecast as a LIVE stateful streaming job "
    "(UD4 class): holt_tail_state_job maintains each series' top-32 "
    "(ts, event_id, value) tail as applyInPandasWithState arrays — the "
    "state merge is top-k-of-union, commutative over micro-batch "
    "boundaries, so the final ring equals the batch ORDER BY ts DESC "
    "LIMIT 32 tail exactly and the query SHARES the batch oracle "
    "(events_holt_linear_forecast). The kernel dot-products are applied "
    "to the final state with the same nano-quantized literal "
    "coefficients, making this one of the few streaming trainers with a "
    "full value-hash gate rather than rows-only. State: 32 doubles + 64 "
    "longs per series.",
    tags=("streaming", "timeseries"),
)
def streaming_holt_forecast(spark, sf_dir):
    events = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    mem = jobs.run_to_memory(
        spark, jobs.holt_tail_state_job(events, k=_HOLT_K),
        output_mode="update",
    )
    final = (
        mem.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(F.desc("seq"))
            ),
        )
        .filter(F.col("rn") == 1)
        .filter(F.col("n_seen") >= _HOLT_K)
    )
    carr = F.array(*[F.lit(c) for c in _HOLT_C])
    darr = F.array(*[F.lit(d) for d in _HOLT_D])
    sz = F.size("tail_values")
    ks = F.sequence(F.lit(0), sz - 1)

    def ksum(arr):
        return F.aggregate(
            ks,
            F.lit(0).cast("long"),
            lambda acc, k: acc
            + F.floor(
                F.element_at(F.col("tail_values"), (k + 1).cast("int"))
                * F.element_at(arr, (k + 1).cast("int"))
                * 1e9
                + 0.5
            ).cast("long"),
        )

    def micro(col):
        return F.floor(col.cast("double") / 1e9 * 1e6 + 0.5) / 1e6

    num_l, num_b = ksum(carr), ksum(darr)
    withn = final.select(
        "event_type", num_l.alias("num_l"), num_b.alias("num_b")
    )
    return withn.select(
        "event_type",
        micro(F.col("num_l")).alias("level"),
        micro(F.col("num_b")).alias("trend"),
        *[
            micro(F.col("num_l") + h * F.col("num_b")).alias(f"forecast_h{h}")
            for h in _HOLT_HS
        ],
    ).orderBy("event_type")


@register(
    "streaming_alert_for_duration",
    oracle=_ALERT_FOR_DURATION_ORACLE,
    doc="promql_alert_for_duration's `for:`-duration alert semantics on "
    "a REAL structured-streaming run: events replay through a streaming "
    "hourly rollup (window aggregate, complete mode, processAllAvailable "
    "replay — see jobs.run_to_memory), and "
    "the gaps-and-islands consecutive-breach detection runs as batch "
    "post-processing over the streamed hours-sized rollup — exactly how "
    "a serving layer evaluates alert rules against live-maintained "
    "state. Shares the batch twin's DuckDB oracle verbatim, so the gate "
    "proves stream-state + serving-side islands == one-shot batch SQL. "
    "Scale: streaming state is (series x active hours) windows; the "
    "islands window sees only the rollup, never raw events.",
    tags=("streaming", "monitoring", "alerting"),
)
def streaming_alert_for_duration(spark, sf_dir):
    stream = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_type", "ts"
    )
    hourly_stream = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    rollup = (
        jobs.run_to_memory(spark, hourly_stream, output_mode="complete")
        .select(
            "event_type",
            F.floor(F.unix_timestamp(F.col("w.start")) / 3600)
            .cast("long")
            .alias("hour_idx"),
            "cnt",
        )
        # hours-sized; checkpoint breaks the memory-sink lineage so the
        # totals self-join below doesn't trip conflicting references
        .localCheckpoint(eager=True)
    )
    totals = rollup.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_hours")
    )
    w = W.partitionBy("event_type").orderBy("hour_idx")
    breaches = (
        rollup.join(F.broadcast(totals), "event_type")
        .where(F.col("cnt") * F.col("n_hours") > 2 * F.col("total"))
        .withColumn("island", F.col("hour_idx") - F.row_number().over(w))
    )
    return (
        breaches.groupBy("event_type", "island")
        .agg(
            F.timestamp_seconds(F.min("hour_idx") * 3600).alias("alert_start"),
            F.timestamp_seconds(F.max("hour_idx") * 3600).alias("alert_end"),
            F.count("*").alias("breach_hours"),
            F.max("cnt").alias("peak_cnt"),
        )
        .where(F.col("breach_hours") >= 2)
        .drop("island")
        .orderBy("event_type", "alert_start")
    )


@register(
    "streaming_offset_week_over_week",
    oracle=_OFFSET_WOW_ORACLE,
    doc="promql_offset_week_over_week's `offset 1w` comparison on a REAL "
    "structured-streaming run (r7 VERDICT stretch item 8 — the last "
    "batch-only PromQL query-layer family gets a live form): events "
    "replay through a streaming hourly count rollup (window aggregate, "
    "complete mode, processAllAvailable replay), and the offset "
    "comparison — the hours-sized rollup self-joined on a week-shifted "
    "key with sign-explicit permille deltas — runs as serving-side "
    "batch post-processing, exactly how a dashboard evaluates "
    "week-over-week panels against live-maintained state. Shares the "
    "batch twin's DuckDB oracle verbatim: stream-state + shifted-key "
    "join == one-shot batch SQL, hash-exact. Scale: streaming state is "
    "one count per active hour; the join input is bounded by the "
    "calendar, never raw events.",
    tags=("streaming", "monitoring", "promql"),
)
def streaming_offset_week_over_week(spark, sf_dir):
    stream = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet").select(
        "ts"
    )
    hourly_stream = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    rollup = (
        jobs.run_to_memory(spark, hourly_stream, output_mode="complete")
        .select(
            F.floor(F.unix_timestamp(F.col("w.start")) / 3600)
            .cast("long")
            .alias("hour_idx"),
            "cnt",
        )
        # hours-sized; checkpoint breaks the memory-sink lineage so the
        # shifted self-join below doesn't trip conflicting references
        .localCheckpoint(eager=True)
    )
    a = rollup.alias("a")
    b = rollup.select(
        (F.col("hour_idx") + 168).alias("hour_idx"),
        F.col("cnt").alias("cnt_prev_week"),
    ).alias("b")
    return (
        a.join(b, "hour_idx")
        .selectExpr(
            "timestamp_seconds(hour_idx * 3600) AS hour",
            "cnt",
            "cnt_prev_week",
            "CAST((cnt - cnt_prev_week) * 1000 DIV cnt_prev_week AS BIGINT) "
            "AS wow_delta_permille",
        )
        .orderBy("hour")
    )


@register(
    "streaming_slo_burn_multiwindow",
    oracle=_SLO_BURN_ORACLE,
    doc="events_slo_burn_multiwindow on a REAL structured-streaming run: "
    "the per-hour error/total counts are maintained as streaming window "
    "state (two conditional aggregates per hour bucket, complete mode, "
    "processAllAvailable replay), and the multi-window burn computation "
    "— trailing "
    "6-hour RANGE frame, integer cross-multiplied paging verdict — runs "
    "as serving-side batch post-processing over the hours-sized rollup. "
    "Shares the batch twin's oracle verbatim: stream-state + serving "
    "math == one-shot batch SQL, hash-exact. Scale: streaming state is "
    "one (err, tot) pair per active hour; the serving window never sees "
    "raw events.",
    tags=("streaming", "monitoring", "alerting"),
)
def streaming_slo_burn_multiwindow(spark, sf_dir):
    stream = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_type", "ts"
    )
    hourly_stream = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_err"),
            F.count("*").cast("long").alias("n_tot"),
        )
    )
    rollup = (
        jobs.run_to_memory(spark, hourly_stream, output_mode="complete")
        .select(
            F.floor(F.unix_timestamp(F.col("w.start")) / 3600)
            .cast("long")
            .alias("hour_idx"),
            "n_err",
            "n_tot",
        )
        .localCheckpoint(eager=True)  # hours-sized serving rollup
    )
    w6 = W.orderBy("hour_idx").rangeBetween(-5, 0)
    win = rollup.select(
        "hour_idx",
        "n_err",
        "n_tot",
        F.sum("n_err").over(w6).cast("long").alias("err_6h"),
        F.sum("n_tot").over(w6).cast("long").alias("tot_6h"),
    )
    return win.selectExpr(
        "timestamp_seconds(hour_idx * 3600) AS hour",
        "n_err",
        "n_tot",
        "CAST(n_err * 10000 DIV n_tot AS BIGINT) AS burn_1h_permille",
        "CAST(err_6h * 10000 DIV tot_6h AS BIGINT) AS burn_6h_permille",
        "CAST(CASE WHEN n_err * 10 > 2 * n_tot "
        "AND err_6h * 10 > 2 * tot_6h THEN 1 ELSE 0 END AS BIGINT) AS page",
    ).orderBy("hour")


@register(
    "streaming_deriv_predict_linear",
    oracle="""
    WITH sec AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 AS abs_s,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
               AS sy_p
      FROM events GROUP BY 1, 2
    ),
    rel AS (
      SELECT event_type,
             abs_s - (SELECT min(abs_s) FROM sec) AS x_s,
             cnt, sy_p
      FROM sec
    ),
    agg AS (
      SELECT event_type, x_s,
             CAST(sum(cnt) OVER w AS BIGINT) AS n,
             CAST(sum(x_s * cnt) OVER w AS BIGINT) AS sx,
             CAST(sum(sy_p) OVER w AS BIGINT) AS sy,
             CAST(sum(x_s * sy_p) OVER w AS BIGINT) AS sxy,
             CAST(sum(x_s * x_s * cnt) OVER w AS BIGINT) AS sxx
      FROM rel
      WINDOW w AS (PARTITION BY event_type ORDER BY x_s
                   RANGE BETWEEN 900 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(x_s AS BIGINT) AS x_s, n AS n_samples,
           floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / 1e4 * 1e6 + 0.5) / 1e6
               AS deriv_per_sec,
           floor((CAST(sy AS DOUBLE) / n
                  + ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * (CAST(x_s + 600 AS DOUBLE) - CAST(sx AS DOUBLE) / n))
                 / 1e4 * 1e6 + 0.5) / 1e6
               AS predict_10m
    FROM agg
    WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
    ORDER BY event_type, x_s
    """,
    doc="promql_deriv_predict_linear's deriv()/predict_linear(v, 600s) on "
    "a REAL structured-streaming run — the live form of the last PromQL "
    "query-layer family (rate/offset/alert/SLO twins landed r5-r8). The "
    "stream maintains per-(event_type, 1-second window) moment PARTIALS "
    "(sample count + 1e-4-quantized value sum) as update-mode state — "
    "the two integers per active second from which every OLS moment "
    "derives (sx = x*cnt, sxy = x*sy, sxx = x^2*cnt), exactly how a "
    "TSDB stores a scrape grid — and the trailing-900s least-squares "
    "slope + 10-minute extrapolation evaluate at serving time over the "
    "seconds-sized rollup. Wall-clock-aligned grid (PromQL evaluates on "
    "absolute time, so the twin's x axis is epoch seconds rebased to "
    "the corpus start at serving; the batch sibling rebases to the "
    "corpus-start MICROsecond, so outputs are per-grid-point here vs "
    "per-sample there — same moments, same expression, own oracle). "
    "All moments are EXACT BIGINT window sums; slope/prediction derive "
    "through a structurally identical double expression on both "
    "engines, floor-micro'd. Scale: state is two longs per active "
    "(series, second); the serving window never sees raw events.",
    tags=("streaming", "monitoring", "promql", "timeseries"),
)
def streaming_deriv_predict_linear(spark, sf_dir):
    stream = jobs.read_parquet_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_type", "ts", "value"
    )
    per_sec_stream = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 second").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.floor(F.col("value") * 1e4 + 0.5).cast("long"))
            .cast("long")
            .alias("sy_p"),
        )
    )
    rollup = (
        jobs.run_to_memory(spark, per_sec_stream, output_mode="complete")
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("abs_s"),
            "cnt",
            "sy_p",
        )
        # seconds-sized serving rollup; checkpoint breaks the memory-sink
        # lineage so the t0 self-aggregate below is conflict-free
        .localCheckpoint(eager=True)
    )
    t0 = rollup.agg(F.min("abs_s").alias("t0"))
    rel = rollup.crossJoin(F.broadcast(t0)).select(
        "event_type",
        (F.col("abs_s") - F.col("t0")).alias("x_s"),
        "cnt",
        "sy_p",
    )
    w = W.partitionBy("event_type").orderBy("x_s").rangeBetween(-900, 0)
    agg = rel.select(
        "event_type",
        "x_s",
        F.sum("cnt").over(w).cast("long").alias("n"),
        F.sum(F.col("x_s") * F.col("cnt")).over(w).cast("long").alias("sx"),
        F.sum("sy_p").over(w).cast("long").alias("sy"),
        F.sum(F.col("x_s") * F.col("sy_p")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("x_s") * F.col("x_s") * F.col("cnt"))
        .over(w)
        .cast("long")
        .alias("sxx"),
    )
    # moment PRODUCTS in double (r8 ADVICE): n*sxy / sx*sy reach ~2.3e15
    # at sf0.1 and scale with span^2 — Spark's non-ANSI long arithmetic
    # would WRAP silently where the DuckDB oracle raises. The window sums
    # themselves stay exact BIGINT; the products are IEEE binary64 on both
    # engines (bit-identical scalar ops), and precision is already capped
    # by the final floor-micro rounding.
    num = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    den = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    slope = num / den
    deriv = F.floor(slope / 1e4 * 1e6 + 0.5) / 1e6
    predict = (
        F.floor(
            (
                F.col("sy").cast("double") / F.col("n")
                + slope
                * (
                    (F.col("x_s") + 600).cast("double")
                    - F.col("sx").cast("double") / F.col("n")
                )
            )
            / 1e4
            * 1e6
            + 0.5
        )
        / 1e6
    )
    return (
        agg.filter(den > 0)
        .select(
            "event_type",
            F.col("x_s").cast("long").alias("x_s"),
            F.col("n").alias("n_samples"),
            deriv.alias("deriv_per_sec"),
            predict.alias("predict_10m"),
        )
        .orderBy("event_type", "x_s")
    )


@register(
    "streaming_incremental_rollup",
    oracle=_IVM_ORACLE,
    doc="rollup_incremental_merge's incremental-view maintenance with the "
    "delta side LIVE: the base state (days up to the mid-week cutoff) "
    "is a batch-materialized partial-state table — yesterday's view — "
    "and the delta (the last 10 days) replays through TWO real "
    "update-surface streaming aggregations in complete mode: the "
    "scalar state (count/sum/min/max per (event_type, week)) and the "
    "exact-distinct bitmap-word state (bit_or per (key, user_id/32) — "
    "constant words per key regardless of traffic). Serving merges "
    "batch state with streamed state through the same partial-agg "
    "algebra (sums add, min/max combine, bitmaps OR then popcount) and "
    "must hash-equal the FULL-recompute DuckDB oracle shared verbatim "
    "with the batch twin — the lakehouse serving pattern (compacted "
    "history + live tail) proven exact, including distinct counts "
    "across the batch/stream boundary. Scale: streaming state is "
    "weeks x types scalar rows plus domain/32 bitmap words; raw "
    "events never reach the serving merge.",
    tags=("streaming", "aggregation", "incremental", "sketch"),
)
def streaming_incremental_rollup(spark, sf_dir):
    from transitdata_monitor_data_collector_spark.plans import table
    from transitdata_monitor_data_collector_spark.plans.relational import (
        ivm_bitmap_state,
        ivm_merge,
        ivm_scalar_state,
    )

    ev = table(spark, sf_dir, "events")
    # planning constant (a catalog lookup at scale): the compaction
    # horizon between the materialized base state and the live tail
    cutoff_day = ev.agg(
        F.date_sub(F.max(F.to_date("ts")), 10).alias("c")
    ).first()["c"]

    def prep(df):
        return df.select(
            "event_type",
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("centi"),
            "user_id",
            F.to_date("ts").alias("day"),
        )

    base = prep(ev).filter(F.col("day") <= F.lit(cutoff_day))

    def delta_stream():
        raw = jobs.read_parquet_stream(
            spark, f"{sf_dir}/events.parquet"
        ).select("event_type", "ts", "value", "user_id")
        return prep(raw).filter(F.col("day") > F.lit(cutoff_day))

    # two live states (a streaming query allows one aggregation chain):
    # complete mode == the memory table IS the current state
    scal_delta = jobs.run_to_memory(
        spark, ivm_scalar_state(delta_stream()), output_mode="complete"
    ).localCheckpoint(eager=True)
    word_delta = jobs.run_to_memory(
        spark, ivm_bitmap_state(delta_stream()), output_mode="complete"
    ).localCheckpoint(eager=True)

    return ivm_merge(
        [ivm_scalar_state(base), scal_delta],
        [ivm_bitmap_state(base), word_delta],
    )
