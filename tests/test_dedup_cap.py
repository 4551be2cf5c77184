"""df-cap soundness for ngram_jaccard_pairs (round-4 VERDICT item 2).

The registered query now applies DEFAULT_MAX_SHINGLE_FREQ during candidate
generation; exact verification on the full shingle sets must make the cap
invisible at gate scale, and the guard must actually bound hot-shingle
candidate blowup.
"""

from __future__ import annotations

from transitdata_monitor_data_collector_spark.operators.dedup import (
    DEFAULT_MAX_SHINGLE_FREQ,
    ngram_jaccard_pairs,
)
from transitdata_monitor_data_collector_spark.plans import table


def _rows(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()
    )


def test_cap_changes_nothing_at_gate_scale(spark, oracle_sf_dir):
    """At the driver-gate SF the capped output must equal exhaustive mode —
    the oracle SQL is uncapped, so this is what keeps the driver row green."""
    docs = table(spark, oracle_sf_dir, "documents")
    capped = ngram_jaccard_pairs(docs, threshold=0.5)
    exhaustive = ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_freq=None)
    assert _rows(capped) == _rows(exhaustive)
    assert DEFAULT_MAX_SHINGLE_FREQ >= 100  # guard stays a scale guard, not a gate hack


def test_cap_bounds_hot_shingle_and_keeps_exact_jaccard(spark):
    # 40 docs sharing ONE boilerplate sentence (a hot shingle family) plus
    # two genuine near-dups that also contain the boilerplate.
    boiler = "subscribe to our newsletter for updates today"
    rows = [(i, f"{boiler} unique doc {i} alpha beta{i} gamma{i}") for i in range(40)]
    rows.append((100, f"{boiler} the quick brown fox jumps over the lazy dog"))
    rows.append((101, f"{boiler} the quick brown fox jumps over the lazy cat"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # cap low enough to kill the boilerplate shingles (df=42 > 10) but the
    # near-dup pair still links through its unique fox/dog shingles
    out = _rows(ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_freq=10))
    assert [(a, b) for a, b, _ in out] == [(100, 101)]
    # jaccard is computed on the FULL sets (boilerplate included), so it
    # matches exhaustive mode exactly for the surviving pair
    exhaustive = _rows(ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_freq=None))
    pair = [t for t in exhaustive if t[:2] == (100, 101)]
    assert pair == out


def test_boilerplate_only_overlap_is_skipped_by_design(spark):
    # two docs whose ONLY overlap is the hot boilerplate: capped mode may
    # not emit them — that is the documented trade-off, assert it holds
    boiler = "one two three four five six seven eight"
    rows = [(i, f"{boiler} filler{i} pad{i} end{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(docs, threshold=0.1, max_shingle_freq=5)
    assert out.count() == 0


def test_recall_report_corpus_guard(spark, sf_dir):
    """r6 VERDICT item 7: the recall reports' exact brute-force
    ground-truth pass refuses oversized corpora loudly instead of
    broadcasting/grinding through them."""
    import pytest as _pytest

    from transitdata_monitor_data_collector_spark.plans import table
    from transitdata_monitor_data_collector_spark.plans.llm_data import (
        _guard_recall_corpus,
    )

    e = table(spark, sf_dir, "embeddings").select("vec_id")
    # gate-scale corpus passes through untouched
    assert _guard_recall_corpus(e, "t") is e
    with _pytest.raises(ValueError, match="refuses"):
        _guard_recall_corpus(e, "t", max_rows=3)


def test_collapse_precheck_auto(spark):
    """Auto mode (r8 VERDICT item 1 follow-through): the exact-duplicate
    collapse is gated on a cheap distinct-content-ratio precheck — a
    dedup-light corpus skips the rep-map/expansion machinery (measured
    1.3-1.6x overhead at sf0.1), a duplicate-heavy one collapses (the
    k=20 38 GB spill fix)."""
    from transitdata_monitor_data_collector_spark.operators import dedup

    light = spark.createDataFrame(
        [(i, f"unique text number {i} with words") for i in range(50)],
        "doc_id long, text string",
    )
    heavy = spark.createDataFrame(
        [(i, f"copy family {i % 5} shared text") for i in range(50)],
        "doc_id long, text string",
    )
    assert dedup._should_collapse(light, "text") is False
    assert dedup._should_collapse(heavy, "text") is True
    # explicit flags force the shape regardless of the data
    assert dedup._resolve_collapse(True, light, "text") is True
    assert dedup._resolve_collapse(False, heavy, "text") is False
    # both shapes produce identical pairs on the same corpus
    on = sorted(
        dedup.minhash_lsh_neardup_pairs(
            heavy, threshold=0.5, dedup_exact_first=True
        ).collect()
    )
    off = sorted(
        dedup.minhash_lsh_neardup_pairs(
            heavy, threshold=0.5, dedup_exact_first=False
        ).collect()
    )
    assert on == off and len(on) > 0


def test_simhash_collapse_equivalence(spark):
    """The simhash banded pipeline's duplicate collapse (r9) must be
    output-identical to the uncollapsed form, with intra-copy pairs at
    hamming 0 (identical texts legitimately pair in the brute-force
    oracle — no empty-set exclusion, unlike Jaccard)."""
    from transitdata_monitor_data_collector_spark.operators import dedup

    rows = []
    vid = 0
    for copy in range(4):
        for fam in range(5):
            rows.append((vid, f"shared family {fam} text with many words here"))
            vid += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    on = sorted(
        dedup.simhash_banded_neardup_pairs(
            df, dedup_exact_first=True
        ).collect()
    )
    off = sorted(
        dedup.simhash_banded_neardup_pairs(
            df, dedup_exact_first=False
        ).collect()
    )
    assert on == off and len(on) > 0
    assert any(r["doc_a"] == 0 and r["doc_b"] == 5 and r["hamming"] == 0
               for r in on)


def test_precheck_memo_shared_within_build(spark):
    """r9 VERDICT item 4 / ADVICE: the eager distinct-ratio precheck is
    memoized per (input frame, column) — one pipeline build over one
    corpus pays it ONCE, streaming inputs get a descriptive build-time
    error, and the memo is clearable (bench.py clears it per timed
    sample so each sample bills its own precheck)."""
    import pytest

    from transitdata_monitor_data_collector_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"unique text number {i} with words") for i in range(50)],
        "doc_id long, text string",
    )
    runs = []
    real_job = dedup._precheck_job

    def counting_job(df, key_expr):
        runs.append(1)
        return real_job(df, key_expr)

    dedup.clear_precheck_memo()
    try:
        dedup._precheck_job = counting_job
        assert dedup._should_collapse(docs, "text") is False
        assert dedup._should_collapse(docs, "text") is False
        assert len(runs) == 1  # second call served from the memo
        # a DIFFERENT frame (even same data, new plan) re-checks
        docs2 = docs.filter("doc_id >= 0")
        dedup._should_collapse(docs2, "text")
        assert len(runs) == 2
        dedup.clear_precheck_memo()
        dedup._should_collapse(docs, "text")
        assert len(runs) == 3  # cleared -> re-billed
    finally:
        dedup._precheck_job = real_job
        dedup.clear_precheck_memo()

    # streaming inputs cannot run the eager scan at plan-build time
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS doc_id", "CAST(value AS STRING) AS text")
    )
    with pytest.raises(ValueError, match="dedup_exact_first"):
        dedup._resolve_collapse(None, stream, "text")


def test_precheck_memo_reevaluates_threshold(spark):
    """r10 ADVICE: the memo stores the raw (n_rows, n_distinct) pair and
    applies DEDUP_COLLAPSE_MAX_DISTINCT_RATIO on every LOOKUP, so code
    that reassigns the module-level threshold between calls gets a fresh
    decision from the cached counts — not a stale boolean computed under
    the old threshold — and pays no extra corpus scan."""
    from transitdata_monitor_data_collector_spark.operators import dedup

    # duplicate-heavy: 50 rows, 5 distinct texts -> distinct ratio 0.1
    docs = spark.createDataFrame(
        [(i, f"dup text {i % 5}") for i in range(50)],
        "doc_id long, text string",
    )
    runs = []
    real_job = dedup._precheck_job

    def counting_job(df, key_expr):
        runs.append(1)
        return real_job(df, key_expr)

    old_ratio = dedup.DEDUP_COLLAPSE_MAX_DISTINCT_RATIO
    dedup.clear_precheck_memo()
    try:
        dedup._precheck_job = counting_job
        assert dedup._should_collapse(docs, "text") is True  # 0.1 <= 0.9
        dedup.DEDUP_COLLAPSE_MAX_DISTINCT_RATIO = 0.05
        assert dedup._should_collapse(docs, "text") is False  # 0.1 > 0.05
        dedup.DEDUP_COLLAPSE_MAX_DISTINCT_RATIO = old_ratio
        assert dedup._should_collapse(docs, "text") is True
        assert len(runs) == 1  # one scan served all three decisions
    finally:
        dedup._precheck_job = real_job
        dedup.DEDUP_COLLAPSE_MAX_DISTINCT_RATIO = old_ratio
        dedup.clear_precheck_memo()
