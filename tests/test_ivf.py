"""IVF ANN tests: deterministic training, probe behavior, the
exact-degradation property (nprobe == n_lists -> identical to brute
force), and recall at partial probe."""

from __future__ import annotations

import pytest

from transitdata_monitor_data_collector_spark.operators import similarity as SIM

QUERY = [0.1] * 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def centroids(emb):
    return SIM.ivf_train_centroids(emb, n_lists=8, max_iter=2)


def test_training_deterministic(emb, centroids):
    again = SIM.ivf_train_centroids(emb, n_lists=8, max_iter=2)
    assert centroids == again


def test_centroid_shape(centroids):
    assert len(centroids) == 8
    assert all(len(c) == 64 for c in centroids)


def test_assign_covers_all_rows(emb, centroids):
    assigned = SIM.ivf_assign(emb, centroids)
    assert assigned.count() == emb.count()
    lists = {r["list_id"] for r in assigned.select("list_id").distinct().collect()}
    assert lists <= set(range(8))
    assert len(lists) > 1  # data actually spreads over lists


def test_full_probe_equals_brute_force(emb, centroids):
    brute = [r["vec_id"] for r in SIM.cosine_topk(emb, QUERY, k=10).collect()]
    full = [
        r["vec_id"]
        for r in SIM.ivf_topk(
            emb, QUERY, k=10, n_lists=8, nprobe=8, centroids=centroids
        ).collect()
    ]
    assert full == brute


def test_partial_probe_recall(emb, centroids):
    brute = {r["vec_id"] for r in SIM.cosine_topk(emb, QUERY, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in SIM.ivf_topk(
            emb, QUERY, k=10, n_lists=8, nprobe=4, centroids=centroids
        ).collect()
    }
    assert len(brute & approx) / 10.0 >= 0.3  # half the lists, useful recall
