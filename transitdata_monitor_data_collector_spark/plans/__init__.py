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

import functools
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: Session confs that individual queries may override for THEIR execution
#: only (performance knobs — never semantics). The registry build wrapper
#: pins each key to the query's override or this default before every
#: build, so an override can never leak into the next query's run.
#: Rationale for the one current key: AQE's partition coalescing is
#: byte-based and CPU-blind — the PQ/IVF trainer shuffles compress to
#: ~1 MB while carrying seconds of CPU-dense distance math, so those
#: queries lower the floor to stay wide (r11). Applied SESSION-WIDE in
#: r11, the 64k floor kept every tiny trainer-round shuffle at full task
#: width and regressed the small-query tail 20-130% at 32 cores (r11
#: VERDICT item 1) — hence per-query scoping. At cluster scale shuffle
#: partitions sit far above either floor and both values are inert.
def _scoped_conf_defaults() -> dict[str, str]:
    return {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": (
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "1MB")
        ),
    }


def _apply_scoped_conf(spark: SparkSession, overrides: dict[str, str]) -> None:
    for k, default in _scoped_conf_defaults().items():
        spark.conf.set(k, overrides.get(k, default))


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
    session_conf: dict[str, str] = field(default_factory=dict)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    session_conf: dict[str, str] | None = None,
) -> Callable:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry.

    ``session_conf`` holds per-query overrides for the scoped performance
    confs (see ``_scoped_conf_defaults``); every registry build — with or
    without overrides — pins those keys first, so one query's override
    cannot bleed into another query's measurement."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        overrides = dict(session_conf or {})

        @functools.wraps(fn)
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_scoped_conf(spark, overrides)
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(
            name=name,
            build=build,
            oracle=oracle,
            doc=doc,
            tags=tags,
            session_conf=overrides,
        )
        return fn

    return deco


# The driver's correctness gate walks the registry in dict order and (as
# observed in CORRECTNESS_r01/r02) records rows for the first 50 entries.
# With 200+ registered queries the rotation is COMPUTED, not
# hand-maintained: ``gate_order`` leads with RE_GATE (explicit re-checks),
# then every query with no row in ANY committed CORRECTNESS_r*.json (the
# never-gated debt, oldest-priority names from GATE_ORDER_HINT first, the
# rest in registration order), then everything else ordered by the AGE of
# its newest driver row (stalest certification first — round-1-vintage
# rows re-certify before round-7 ones, since the engine underneath them
# has been rewritten the most). Adding a query auto-queues it for the
# next driver gate; a new CORRECTNESS file rotates the window with zero
# edits here.

# Queries whose oracle or plan changed AFTER their latest driver row —
# their old green rows are stale, so they re-gate even though a row
# exists. PRUNE an entry once a post-fix CORRECTNESS row lands (cost of
# forgetting: a wasted window slot, not starvation).
RE_GATE: list[str] = [
    # (All 3 r11 RE_GATE entries pruned: agg_bitmap_distinct_users,
    # events_wau_bitmap_exact and streaming_bitmap_distinct each landed a
    # hash-green row in CORRECTNESS_r11 under the word-slot rewrite.)
    # r11 VERDICT item 2: both r11 rewrites missed the r11 oracle sample
    # (their last green rows predate the rewrite) — re-certify first.
    # Both were restructured AGAIN in r12 (percentile: exact twins from
    # the distinct-value histogram; rrf: decoupled corpus stats), so the
    # driver gate certifies the current code either way.
    "agg_approx_percentile_bounded",
    "agg_approx_percentile_bounded_diag",
    "retrieval_hybrid_rrf",
    # round 12 restructures (values pinned by parity tests at 3 SFs;
    # plans changed after these queries' latest driver rows):
    "doc_quality_logreg_hashed",        # per-round err persist
    "doc_quality_logreg_hashed_topfeatures",
    "text_bpe_train_merges",            # fused per-round jobs
    "doc_exact_substring_dedup",        # fused iv consumers
    "graph_pagerank_transitions",       # bounded driver gate
    "doc_dedup_clusters",               # components null/nodes semantics
    # lazy Lloyd-round checkpoints + scoped AQE floor (shared trainers):
    "emb_ivfadc_recall_clustered",
    "emb_pq_recall_report",
    "emb_pq_k64_recall_clustered",
    "emb_ivf_recall_report",
    "emb_ivf_nprobe_sweep",
    "emb_compression_ladder_clustered",
]

# Priority hint for the never-gated queue: oldest debt first (round-3-era
# additions that predate the newest CORRECTNESS file). Names here that
# HAVE earned a row are skipped automatically — a stale hint is harmless.
GATE_ORDER_HINT: list[str] = [
    # round 7: the 12 registry queries still lacking ANY driver row
    # (VERDICT r6 "What's missing") — this is the last never-gated debt;
    # after r7's window they all hold a CORRECTNESS row.
    "streaming_holt_forecast",
    "window_range_numeric_frame",
    "join_null_safe_equality",
    "join_asof_nearest",
    "agg_bitmap_distinct_users",
    "agg_weighted_median",
    "basket_part_pair_lift",
    "graph_triangle_count",
    "orders_cohort_clv",
    "orders_rfm_segmentation",
    "orders_ship_lead_time",
    "parts_abc_pareto",
    # round 6: the never-gated entries whose semantics are hardest to
    # trust from the local mirror alone (r5 VERDICT item 3) — streaming
    # sketch replays, VARIANT shredding, TRY arithmetic. Promoted so the
    # ~6 never-gated queries that spill past the 50-slot window into r7
    # are the LOW-risk tail, not these.
    "json_variant_shred",
    "streaming_bitmap_distinct",
    "streaming_cms_heavy_hitters",
    "streaming_histogram_buckets",
    "agg_conditional_family",
    "scalar_try_arithmetic",
    "events_chain_recursive_cte",
    "events_wau_bitmap_exact",
    "join_shuffle_hash_hint",
    "window_rank_functions",
    # round 5: UD4 on transformWithStateInPandas, unlocked by the vendored
    # protobuf wire-format runtime (vendor/pbshim) — gate first: it is the
    # round's flagship capability close (VERDICT r4 item 5)
    "streaming_tws_counter",
    # never gated as of r03: monitoring/events analytics (round 3)
    "events_anomaly_zscore",
    "events_user_profile",
    "events_top_paths",
    "events_error_budget_burn",
    "events_alert_flap_detection",
    "events_hourly_seasonality",
    "agg_mode_most_frequent",
    "promql_histogram_quantile",
    "promql_avg_max_over_time",
    "mqtt_topic_depth_stats",
    "window_ntile_quartiles",
    # never gated: joins / temporal (round 3)
    "join_interval_overlap",
    "scd2_point_in_time",
    # never gated: LLM-data extensions (round 3)
    "doc_containment_pairs",
    "doc_mixture_resample",
    "doc_quality_weighted_sample",
    "doc_token_budget_trim",
    "text_bigrams_topk",
    "emb_centroid_confusion",
    "emb_hard_negatives_centroid",
    # round 4: IVF recall report (deterministic Lloyd -> oracle-checkable)
    "emb_ivf_recall_report",
    # round 4: new operators (BM25, BPE pairs, reservoir, winnowing,
    # Markov transitions, MAD anomalies, unigram perplexity)
    "text_bm25_search",
    "text_bpe_merge_pairs",
    "doc_reservoir_per_source",
    "doc_winnowing_fingerprints",
    "events_transition_matrix",
    "events_anomaly_mad",
    "doc_perplexity_unigram",
    "emb_semantic_dedup",
    # round 4 (late additions): product/events analytics + iterative graph
    "events_funnel_conversion",
    "events_retention_normalized",
    "events_pivot_daily_wide",
    "events_histogram_equiwidth",
    "events_corr_value_hour",
    "timeseries_ewma",
    "graph_pagerank_transitions",
    "text_collocations_pmi",
    "text_zipf_profile",
    "sketch_countmin_heavy_hitters",
    "multimodal_audio_energy",
    "doc_dsir_importance",
    "text_char_entropy",
    "events_cusum_changepoint",
]


def _gated_rounds() -> dict[str, int]:
    """name -> NEWEST driver-CORRECTNESS round holding a row for it,
    over every committed CORRECTNESS_r*.json at the repo root
    (missing/corrupt files are skipped — worst case a query re-gates,
    never starves)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                for name in json.load(f):
                    latest[name] = max(latest.get(name, 0), rnd)
        except (OSError, ValueError):
            continue
    return latest


def gate_order(names) -> list[str]:
    """Computed gate rotation over ``names`` (any iterable of registry
    names in registration order): RE_GATE first, then never-gated
    (hint-ordered, then registration order), then the already-green rest
    ordered stalest-certification-first (ascending newest-row round,
    registration order as the tiebreak) so old green rows re-certify
    against the current engine before recent ones repeat.
    """
    names = list(names)
    in_reg = set(names)
    rounds = _gated_rounds()
    lead: list[str] = [n for n in RE_GATE if n in in_reg]
    seen = set(lead)
    for n in GATE_ORDER_HINT:
        if n in in_reg and n not in rounds and n not in seen:
            lead.append(n)
            seen.add(n)
    for n in names:
        if n not in rounds and n not in seen:
            lead.append(n)
            seen.add(n)
    rest = [n for n in names if n not in seen]
    pos = {n: i for i, n in enumerate(rest)}
    rest.sort(key=lambda n: (rounds.get(n, 0), pos[n]))
    return lead + rest


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY).

    Returns the registry reordered by :func:`gate_order` — the driver's
    50-row gate window then covers re-gates and never-gated queries
    first, and rotates automatically as CORRECTNESS files accumulate.
    """
    from transitdata_monitor_data_collector_spark.plans import (  # noqa: F401
        llm_data,
        monitoring,
        relational,
        streaming_queries,
        tpch_extra,
    )

    return {n: REGISTRY[n] for n in gate_order(REGISTRY)}


_NANO_COLS_CACHE: dict[str, list[str]] = {}


def _nano_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's reader rejects
    those outright, so they're read as long and truncated to micros
    (matching DuckDB's ns -> us truncation). ``path`` may also be a
    DIRECTORY of parquet files (e.g. the disorder-replay test fixtures
    name a slice dir ``events.parquet``): the footer of any one member
    file carries the shared schema."""
    if path not in _NANO_COLS_CACHE:
        import glob
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            members = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not members:
                _NANO_COLS_CACHE[path] = []
                return []
            probe = members[0]
        schema = pq.read_schema(probe)
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
