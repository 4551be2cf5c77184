"""Partition-count invariance — execution-parallelism determinism.

The k-stress (tools/stress_parity.py) varies DATA volume; this suite
varies EXECUTION parallelism: every result the engine hash-gates must be
byte-identical whether a stage runs in 3 partitions or 17. Any
order-dependent float accumulation, non-total window ordering, or
partition-sensitive tie-break that slipped past the oracle (because
DuckDB happened to iterate in the same order) shows up here as a
same-engine self-mismatch — the cheapest possible determinism probe, no
oracle needed.

The slice is the registry's most order-sensitive shapes: exact-decimal
money sums, truncated-kernel smoothing, LSH banding + verify, iterative
trainers (dense GD, sparse GD, BPE, PQ), sweep-line tie groups, and the
bottom-k weighted sampler.
"""

from __future__ import annotations

import pytest

from transitdata_monitor_data_collector_spark.plans import load_all

REGISTRY = load_all()

SENSITIVE = [
    "q1_pricing_summary",
    "timeseries_ewma",
    "events_holt_linear_forecast",
    "doc_minhash_lsh_neardup",
    "doc_quality_logreg",
    "doc_quality_logreg_hashed",
    "doc_quality_logreg_hashed_topfeatures",
    "emb_pq_recall_report",
    "emb_compression_ladder_clustered",
    "events_concurrent_sessions",
    "doc_weighted_sample_es",
    # round-8 additions: the migrated deterministic-IVF top-k and the
    # two-trainer IVFADC composition (coarse assign + residual PQ + ADC)
    "emb_ann_ivf_topk",
    "emb_ivfadc_recall_clustered",
    # round-8 late additions: IVM state merge (bitmap OR + partial-agg
    # algebra) and the streamed OLS-moment serving window
    "rollup_incremental_merge",
    "streaming_deriv_predict_linear",
    "streaming_incremental_rollup",
    # round-10 additions: the bounded-approx primaries — the GK/HLL
    # sketch VALUES may legitimately vary with partition-merge order,
    # so these prove the primary outputs (exact twins + bound verdicts)
    # are invariant anyway: the verdict must hold under ANY merge order
    "agg_approx_percentile_bounded",
    "agg_approx_count_distinct",
    "events_dau_wau_stickiness_approx",
]


def _rows(spark, name: str, sf_dir: str, parts: int):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        df = REGISTRY[name].build(spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(
            (tuple(r[c] for c in cols) for r in df.collect()),
            key=lambda t: tuple((v is None, str(v)) for v in t),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_partition_count(
    name, spark, oracle_sf_dir
):
    a = _rows(spark, name, oracle_sf_dir, 3)
    b = _rows(spark, name, oracle_sf_dir, 17)
    assert a == b, f"{name}: result depends on shuffle partition count"
