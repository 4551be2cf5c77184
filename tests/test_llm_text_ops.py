"""Semantic invariants for the training-data prep operators (chunking,
decontamination, TF-IDF) — properties the oracle hash-compare can't state
explicitly, checked on real query output at sf0.001.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.plans import load_all, table

REGISTRY = load_all()


def test_chunking_covers_every_token_with_fixed_stride(spark, sf_dir):
    chunks = REGISTRY["doc_chunking"].build(spark, sf_dir).collect()
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        )
        .collect()
    }
    by_doc: dict[int, list] = defaultdict(list)
    for r in chunks:
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == set(n_tokens)  # every doc is chunked
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_start"])
        starts = [r["chunk_start"] for r in rows]
        # arithmetic stride-96 sequence from 1, covering all n tokens
        assert starts == list(range(1, max(n_tokens[doc_id], 1) + 1, 96))
        n = max(n_tokens[doc_id], 1)
        for r in rows:
            # a chunk is full when 128 tokens remain, else runs to the end
            expected = min(128, n - r["chunk_start"] + 1)
            assert r["n_chunk_tokens"] == expected, (doc_id, r)
        # the final chunk reaches exactly the last token
        tail = rows[-1]
        assert tail["chunk_start"] + tail["n_chunk_tokens"] - 1 == n


def test_decontamination_flags_only_train_docs(spark, sf_dir):
    from transitdata_monitor_data_collector_spark.plans.llm_data import _MD5_PCT

    flagged = REGISTRY["doc_decontamination"].build(spark, sf_dir).collect()
    eval_ids = {
        r["doc_id"]
        for r in table(spark, sf_dir, "documents")
        .filter(F.expr(_MD5_PCT) < 10)
        .select("doc_id")
        .collect()
    }
    for r in flagged:
        assert r["doc_id"] not in eval_ids  # eval docs never flag themselves
        assert r["n_shared_shingles"] >= 1
        assert r["n_eval_docs"] >= 1


def test_tfidf_topk_is_per_doc_descending(spark, sf_dir):
    rows = REGISTRY["text_tfidf_topk"].build(spark, sf_dir).collect()
    by_doc: dict[int, list] = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    for doc_id, rs in by_doc.items():
        assert 1 <= len(rs) <= 3
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True), doc_id
        assert len({r["term"] for r in rs}) == len(rs)  # distinct terms


def test_kmv_sketch_bounds_and_exact_small_groups(spark, sf_dir):
    """KMV invariants: when a group has fewer than k distinct values the
    sketch IS exact; otherwise the estimate is within the theoretical
    ~4/sqrt(k) relative-error envelope (generous 5x slack — the bound is
    in expectation, and a driver-hash flake here would be data-dependent
    noise, not a defect)."""
    from transitdata_monitor_data_collector_spark.plans.llm_data import _KMV_K

    rows = REGISTRY["sketch_kmv_distinct"].build(spark, sf_dir).collect()
    assert rows, "no language groups"
    for r in rows:
        if r["n_exact"] < _KMV_K:
            assert r["kmv_estimate"] == r["n_exact"], r
        else:
            rel = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
            assert rel <= 5 * 4 / _KMV_K**0.5, r


def test_bloom_screen_has_no_false_negatives(spark, sf_dir):
    """Bloom membership is one-sided: every truly-present eval gram must
    be a candidate (no false negatives), candidates decompose into
    present + false positives, and the filter never exceeds its m
    positions."""
    from transitdata_monitor_data_collector_spark.plans.llm_data import _BLOOM_M

    [r] = REGISTRY["sketch_bloom_decontamination"].build(spark, sf_dir).collect()
    assert r["n_candidates"] >= r["n_present"]
    assert r["n_candidates"] == r["n_present"] + r["n_false_pos"]
    assert 0 < r["bits_set"] <= _BLOOM_M
    assert r["n_eval_grams"] >= r["n_candidates"]


def test_jsd_bounded_and_zero_on_identical_halves(spark, sf_dir):
    """JSD is bounded by ln 2; every document's tokens land in exactly
    one half, so per-lang token totals must partition the corpus."""
    import math

    rows = REGISTRY["text_jsd_corpus_drift"].build(spark, sf_dir).collect()
    assert rows
    totals = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .select("lang", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").alias("n"))
        .collect()
    }
    for r in rows:
        assert -1e-9 <= r["jsd"] <= math.log(2) + 1e-9, r
        assert r["n_tokens_a"] + r["n_tokens_b"] == totals[r["lang"]], r


def test_ngram_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """The smallest doc_id with >=8 tokens has novelty exactly 1.0, and
    novelty fractions are valid (0 < n_novel <= n_grams ... n_novel can
    be 0 for later duplicate docs)."""
    rows = REGISTRY["doc_ngram_novelty"].build(spark, sf_dir).collect()
    assert rows
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["novelty"] == 1.0 and first["n_novel"] == first["n_grams"]
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"], r


def test_kneser_ney_counts_and_sign(spark, sf_dir):
    """Every doc with n tokens contributes exactly n-1 bigram slots, and
    log-probabilities are strictly negative (P < 1 for every bigram in a
    corpus with more than one bigram type)."""
    rows = REGISTRY["doc_perplexity_kneser_ney"].build(spark, sf_dir).collect()
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n")
        )
        .collect()
    }
    assert rows
    for r in rows:
        assert r["n_bigrams"] == n_tokens[r["doc_id"]] - 1, r
        assert r["mean_logprob"] < 0, r


def test_bitmap_distinct_matches_exact(spark, sf_dir):
    got = {
        r["day"]: r["n_users_bitmap"]
        for r in REGISTRY["agg_bitmap_distinct_users"]
        .build(spark, sf_dir)
        .collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_cdc_chunks_reconstruct_and_resync(spark, sf_dir):
    """CDC invariants: per source, chunk chars reconstruct the filtered
    corpus exactly, and dedup ratio is in [0, 1)."""
    rows = REGISTRY["doc_cdc_chunk_dedup"].build(spark, sf_dir).collect()
    assert rows
    chars = {
        r["source"]: r["c"]
        for r in table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 8)
        .groupBy("source")
        .agg(F.sum(F.length("text")).alias("c"))
        .collect()
    }
    for r in rows:
        assert r["total_chunk_chars"] == chars[r["source"]], r
        assert 0 <= r["dedup_ratio_micro"] < 1_000_000, r
        assert r["distinct_chunks"] <= r["total_chunks"], r
