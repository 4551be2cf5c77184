"""Empty-input robustness: every representative operator class must
execute (and return an empty or well-defined result) against ZERO-row
tables with the production schema — the first hour of a fresh deployment,
a filtered-out partition, or a quiet broker must not crash a pipeline.
"""

from __future__ import annotations

import pytest

from transitdata_monitor_data_collector_spark.plans import load_all

REGISTRY = load_all()

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# One representative per operator family. Excluded by design: queries that
# TRAIN on the corpus (IVF/PQ k-means needs seed vectors) or that read a
# literal query vector from the data — those legitimately require rows.
EMPTY_SAFE = [
    "q1_pricing_summary",            # aggregation
    "q3_shipping_priority",          # join + agg + topk
    "mqtt_fanout_window_rate",       # fan-out + window agg
    "doc_exact_dedup",               # hash groupBy
    "doc_minhash_lsh_neardup",       # LSH join pipeline
    "doc_gopher_repetition_rules",   # span sweep windows
    "doc_exact_substring_dedup",     # inverted-index join
    "text_tfidf_topk",               # explode + join + window
    "sketch_countmin_heavy_hitters", # sketch build + probe
    "events_kaplan_meier_churn",     # survival windows
    "events_chain_recursive_cte",    # recursive CTE
    "window_topk_per_group",         # window + limit
    "join_interval_bin_equi",        # derived-dim bin join
    "promql_deriv_predict_linear",   # RANGE-window OLS
    "events_conformance_check",      # sessionized windows
]


@pytest.fixture(scope="module")
def empty_sf_dir(sf_dir, tmp_path_factory):
    # single parquet FILES (plans.table reads the footer directly), with
    # the exact production schema but zero row groups
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_runs_on_empty_input(spark, empty_sf_dir, name):
    df = REGISTRY[name].build(spark, empty_sf_dir)
    assert df.count() == 0
