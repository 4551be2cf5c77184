"""bench.py's warm-cache guard (r7 VERDICT item 5).

r6 recorded a 1.48 s bench number for doc_quality_logreg_hashed that was
measuring leaked warm caches (honest cold: 3.37 s). _assert_cold makes
that mismeasurement class structurally impossible: any cached plan still
registered when a timed run starts fails the whole bench run.
"""

from __future__ import annotations

import pytest

from bench import _assert_cold


def test_leaked_cache_fails_the_bench(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet").cache()
    df.count()  # materialize so the cache is registered and live
    try:
        with pytest.raises(RuntimeError, match="cached plans leaked"):
            _assert_cold(spark, "some_query")
    finally:
        df.unpersist(blocking=True)


def test_clean_session_passes_and_drains_checkpoint_leftovers(spark, sf_dir):
    # order-independence: an earlier test module may have built queries
    # that .cache() at build time (the bench loop clearCaches the same
    # way before this guard runs)
    spark.catalog.clearCache()
    # a dead localCheckpoint RDD (the IVF/PQ Lloyd-round shape) is memory
    # pressure, not warm-cache reuse — the guard drains it, not fails
    spark.read.parquet(f"{sf_dir}/nation.parquet").localCheckpoint(
        eager=True
    )
    _assert_cold(spark, "some_query")
    assert spark.sparkContext._jsc.getPersistentRDDs().isEmpty()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
