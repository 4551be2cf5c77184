"""Banded RP-LSH near-dup: exact-output equivalence with brute force on a
corpus with PLANTED near-duplicates (the synthetic embeddings tables have
no pairs above the threshold, so the registry oracle checks the
zero-output case; this pins the nonzero case)."""

from __future__ import annotations

import math

import pytest

from transitdata_monitor_data_collector_spark.operators.similarity import (
    cosine_neardup_pairs,
    rp_banded_candidates,
    rp_lsh_neardup_pairs,
)

DIM = 16


def _unit(seed: int) -> list[float]:
    # deterministic pseudo-random unit vector (no RNG state)
    vals = [math.sin(seed * 37.0 + i * 7.31) for i in range(DIM)]
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


def _perturb(v: list[float], eps: float, seed: int) -> list[float]:
    out = [x + eps * math.cos(seed * 13.0 + i * 3.7) for i, x in enumerate(v)]
    n = math.sqrt(sum(x * x for x in out))
    return [x / n for x in out]


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    vid = 0
    for g in range(8):
        base = _unit(g + 1)
        rows.append((vid, base))
        vid += 1
        # two tight perturbations -> cosine well above 0.9 with the base
        for j in (1, 2):
            rows.append((vid, _perturb(base, 0.02 * j, g * 10 + j)))
            vid += 1
    for k in range(40):  # background vectors, mostly unrelated
        rows.append((vid, _unit(1000 + k)))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_matches_brute_force_exactly(planted):
    brute = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cosine_neardup_pairs(planted, threshold=0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in rp_lsh_neardup_pairs(planted, dim=DIM, threshold=0.9).collect()
    }
    assert len(brute) >= 8 * 3  # every planted triple produces 3 pairs
    assert lsh == brute


def test_candidates_are_a_superset_of_true_pairs(planted):
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(planted, threshold=0.9).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in rp_banded_candidates(planted, dim=DIM).collect()
    }
    assert true_pairs <= cands


# ---------------------------------------------------------------------------
# SimHash banded hamming near-dup (pigeonhole recall guarantee)
# ---------------------------------------------------------------------------


def test_simhash_banded_exact_dups_and_recall(spark):
    from transitdata_monitor_data_collector_spark.operators.dedup import (
        simhash_banded_neardup_pairs,
        simhash_md5,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (3, "the quick brown fox jumps over the lazy cat"),  # near dup
            (4, "completely different content about spark engines"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_banded_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text -> identical signature

    # banded candidates vs brute force over the signatures: every pair
    # within the hamming budget MUST be found (pigeonhole, not probability)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_md5(docs).collect()}
    brute = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert set(pairs) == brute


def test_simhash_banded_rejects_bad_band_count(spark):
    from transitdata_monitor_data_collector_spark.operators.dedup import (
        simhash_banded_neardup_pairs,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_banded_neardup_pairs(docs, max_hamming=4, n_bands=4)


def test_rp_lsh_vector_collapse_equivalence(spark):
    """The exact-duplicate vector collapse (r9: the k=20 invariant sweep
    caught identical vectors colliding in every band, k^2-multiplying the
    candidate distinct) must be output-identical to the uncollapsed
    pipeline, and zero-norm duplicate groups must NOT expand into 1.0
    intra pairs (brute-force cosine is NULL for them)."""
    from transitdata_monitor_data_collector_spark.operators.similarity import (
        rp_lsh_neardup_pairs,
    )

    base = [[1.0, 0.0, 0.0, 0.1], [0.99, 0.01, 0.0, 0.1],
            [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]]
    rows = []
    vid = 0
    for copy in range(4):  # 4 exact copies of each vector
        for v in base:
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    on = sorted(
        rp_lsh_neardup_pairs(
            df, dim=4, threshold=0.9, dedup_exact_first=True
        ).collect()
    )
    off = sorted(
        rp_lsh_neardup_pairs(
            df, dim=4, threshold=0.9, dedup_exact_first=False
        ).collect()
    )
    assert on == off and len(on) > 0
    # every pair involving the zero vector's copies is absent
    zero_ids = {3, 7, 11, 15}
    assert all(
        r["id_a"] not in zero_ids and r["id_b"] not in zero_ids for r in on
    )
    # intra-copy pairs of a nonzero vector are present at exactly 1.0
    assert any(r["id_a"] == 0 and r["id_b"] == 4 and r["cos_sim"] == 1.0
               for r in on)
