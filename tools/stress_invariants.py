"""At-scale Spark-side value checks for the k-stress ORACLE-COST skip list
(r8 VERDICT item 2).

Six registry queries are excluded from the cross-engine k-sweep because
their DuckDB oracle is super-linear in duplicated corpora (recursive
closure / all-pairs CTEs) — which previously left their Spark sides with
only a "completes standalone" claim at scale. Each has an exploitable
invariant under the stress builder's k-fold replication (identical
text/vectors under ids shifted by replica * shift), so their OUTPUT VALUES
are checked at k without any oracle:

- doc_dedup_clusters — cluster structure is content-determined: the k=20
  label table must be exactly the base table replicated (cluster_id = the
  base cluster's min id, which is a replica-0 id), plus label idempotence
  (re-clustering the base survivor set is a fixed point: all singletons).
- doc_curation — stage statuses split by what they depend on: lang/
  quality/repetition are pure functions of text (all copies inherit the
  base status); dedup stages resolve by min-id (replica 0 keeps the base
  status, every other copy becomes 'exact_dup').
- doc_curation_v2 — same split, plus the cross-doc dup_spans stage
  flips: at k >= 2 EVERY 10-gram of every >= 10-token doc is shared (its
  copies), so any doc passing gopher+repetition with grams becomes
  'dup_spans'; gram-less docs fall through to the min-id/exact_dup and
  doc_id-keyed sampling rules, which replica 0 inherits unchanged.
- doc_exact_substring_dedup — at k >= 2 every gram is shared, so every
  >= 10-token doc's expected row is (distinct-gram count, 1.0, flagged)
  and every shorter doc's is (0, 0.0, false) — fully derivable from the
  base corpus.
- multimodal_feature_neardup — copies have identical features and
  therefore identical LSH signatures: the k pair set must be exactly the
  base pairs expanded k x k (same cosine) plus C(k,2) intra-copy pairs
  per featured doc at cosine 1.0.
- doc_minhash_estimate_error — the error profile is copy-invariant:
  n_pairs scales as k^2 * base + C(k,2) * (docs with shingles), max error
  is unchanged (intra-copy pairs have error 0), the over-threshold count
  scales like n_pairs, and the integer-DIV mean stays inside the bound
  derivable from the base mean.

Run via  python tools/stress_parity.py <k> --invariants  (the sweep's
sibling mode). Prints one line per check; exit code = failure count.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def _shift(spark) -> int:
    return (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .agg(F.max("doc_id"))
        .first()[0]
        + 1
    )


def _replicas(spark, k: int):
    return spark.range(0, k).select(F.col("id").alias("r"))


def _empty_diff(a, b) -> tuple[bool, str]:
    """Exact multiset equality of two DataFrames, checked distributed."""
    extra = a.exceptAll(b).count()
    missing = b.exceptAll(a).count()
    return extra == 0 and missing == 0, f"extra={extra} missing={missing}"


def check_dedup_clusters(spark, registry, k, sf20):
    from transitdata_monitor_data_collector_spark.operators.dedup import (
        dedup_clusters,
    )
    from transitdata_monitor_data_collector_spark.plans import table

    shift = _shift(spark)
    out1 = registry["doc_dedup_clusters"].build(spark, SRC).localCheckpoint()
    out20 = registry["doc_dedup_clusters"].build(spark, sf20)

    expected = (
        out1.crossJoin(_replicas(spark, k))
        .select(
            (F.col("doc_id") + F.col("r") * shift).alias("doc_id"),
            F.col("cluster_id"),  # base cluster min id IS the k min id
            (
                (F.col("doc_id") + F.col("r") * shift) == F.col("cluster_id")
            ).alias("is_kept"),
        )
    )
    ok, detail = _empty_diff(out20, expected)
    yield "doc_dedup_clusters/replication", ok, detail

    # label idempotence: re-clustering the base survivors is a fixed point
    docs = table(spark, SRC, "documents")
    survivors = docs.join(
        out1.filter("is_kept").select("doc_id"), "doc_id", "left_semi"
    )
    relab = dedup_clusters(survivors, threshold=0.5)
    n_moved = relab.filter(F.col("cluster_id") != F.col("doc_id")).count()
    yield "doc_dedup_clusters/idempotence", n_moved == 0, f"moved={n_moved}"


def check_curation(spark, registry, k, sf20):
    shift = _shift(spark)
    out1 = registry["doc_curation"].build(spark, SRC).localCheckpoint()
    out20 = registry["doc_curation"].build(spark, sf20)
    content_only = F.col("status").isin("lang", "quality", "repetition")
    status = F.when(content_only, F.col("status")).otherwise(
        F.when(F.col("r") == 0, F.col("status")).otherwise(F.lit("exact_dup"))
    )
    expected = (
        out1.crossJoin(_replicas(spark, k))
        .select(
            (F.col("doc_id") + F.col("r") * shift).alias("doc_id"),
            "lang_pred",
            "quality",
            "dup_word_frac",
            status.alias("status"),
            (status == "kept").alias("kept"),
        )
    )
    ok, detail = _empty_diff(out20, expected)
    yield "doc_curation/replication", ok, detail


def check_curation_v2(spark, registry, k, sf20):
    from transitdata_monitor_data_collector_spark.functions import text as TX
    from transitdata_monitor_data_collector_spark.plans import table

    shift = _shift(spark)
    out1 = registry["doc_curation_v2"].build(spark, SRC).localCheckpoint()
    out20 = registry["doc_curation_v2"].build(spark, sf20)

    # docs with >= 10 (lowercased, whitespace) tokens have 10-gram spans
    has_grams = table(spark, SRC, "documents").select(
        "doc_id",
        (F.size(TX.tokens(F.lower(F.col("text")))) >= 10).alias("grams"),
    )
    base = out1.join(has_grams, "doc_id")
    content_only = F.col("status").startswith("gopher:") | (
        F.col("status") == "repetition"
    )
    status = (
        F.when(content_only, F.col("status"))
        # at k >= 2 every gram is cross-doc shared -> x_frac = 1.0 > 0.2
        .when(F.col("grams"), F.lit("dup_spans"))
        .when(F.col("r") > 0, F.lit("exact_dup"))
        .otherwise(F.col("status"))
    )
    expected = base.crossJoin(_replicas(spark, k)).select(
        (F.col("doc_id") + F.col("r") * shift).alias("doc_id"),
        status.alias("status"),
        (status == "kept").alias("kept"),
    )
    ok, detail = _empty_diff(out20, expected)
    yield "doc_curation_v2/replication", ok, detail


def check_exact_substring(spark, registry, k, sf20):
    from transitdata_monitor_data_collector_spark.plans.llm_data import (
        _docs_spread,
        _ngram_spans,
        _tok_offsets,
    )

    shift = _shift(spark)
    out20 = registry["doc_exact_substring_dedup"].build(spark, sf20)

    d = _docs_spread(spark, SRC)
    off, _total = _tok_offsets(d)
    grams = (
        _ngram_spans(off, 10)
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )
    expected_base = (
        d.select("doc_id")
        .join(grams, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        )
        .select(
            "doc_id",
            "n_shared_grams",
            F.when(F.col("n_shared_grams") > 0, 1.0)
            .otherwise(0.0)
            .alias("dup_span_frac"),
            (F.col("n_shared_grams") > 0).alias("is_flagged"),
        )
    )
    expected = expected_base.crossJoin(_replicas(spark, k)).select(
        (F.col("doc_id") + F.col("r") * shift).alias("doc_id"),
        "n_shared_grams",
        "dup_span_frac",
        "is_flagged",
    )
    ok, detail = _empty_diff(out20, expected)
    yield "doc_exact_substring_dedup/replication", ok, detail


def check_multimodal_neardup(spark, registry, k, sf20):
    from transitdata_monitor_data_collector_spark.operators.multimodal import (
        extract_features,
        synthesize_image_payloads,
    )
    from transitdata_monitor_data_collector_spark.plans import table

    shift = _shift(spark)
    out1 = (
        registry["multimodal_feature_neardup"].build(spark, SRC)
        .localCheckpoint()
    )
    out20 = registry["multimodal_feature_neardup"].build(spark, sf20)

    r2 = (
        _replicas(spark, k)
        .crossJoin(_replicas(spark, k).withColumnRenamed("r", "r2"))
    )
    cross = out1.crossJoin(r2).select(
        F.least(
            F.col("id_a") + F.col("r") * shift,
            F.col("id_b") + F.col("r2") * shift,
        ).alias("id_a"),
        F.greatest(
            F.col("id_a") + F.col("r") * shift,
            F.col("id_b") + F.col("r2") * shift,
        ).alias("id_b"),
        "cos_sim",
    )
    featured = extract_features(
        synthesize_image_payloads(table(spark, SRC, "documents"))
    ).filter(F.col("feature").isNotNull()).select("doc_id")
    intra = (
        featured.crossJoin(
            r2.filter(F.col("r") < F.col("r2"))
        )
        .select(
            (F.col("doc_id") + F.col("r") * shift).alias("id_a"),
            (F.col("doc_id") + F.col("r2") * shift).alias("id_b"),
            F.lit(1.0).alias("cos_sim"),
        )
    )
    ok, detail = _empty_diff(out20, cross.unionByName(intra))
    yield "multimodal_feature_neardup/replication", ok, detail


def check_minhash_estimate_error(spark, registry, k, sf20):
    from transitdata_monitor_data_collector_spark.operators.dedup import (
        shingle_sets,
    )
    from transitdata_monitor_data_collector_spark.plans import table

    r1 = registry["doc_minhash_estimate_error"].build(spark, SRC).first()
    r20 = registry["doc_minhash_estimate_error"].build(spark, sf20).first()
    d_shingled = (
        shingle_sets(table(spark, SRC, "documents"), "text", "doc_id", 3)
        .filter(F.col("set_size") > 0)
        .count()
    )
    n1 = r1["n_pairs"]
    intra = k * (k - 1) // 2 * d_shingled
    exp_pairs = k * k * n1 + intra
    ok_pairs = r20["n_pairs"] == exp_pairs
    yield (
        "doc_minhash_estimate_error/n_pairs",
        ok_pairs,
        f"got={r20['n_pairs']} expected={exp_pairs}",
    )
    ok_max = r20["max_abs_err_permille"] == r1["max_abs_err_permille"]
    yield (
        "doc_minhash_estimate_error/max_err",
        ok_max,
        f"got={r20['max_abs_err_permille']} base={r1['max_abs_err_permille']}",
    )
    exp_over = k * k * r1["n_est_over_threshold"] + intra
    ok_over = r20["n_est_over_threshold"] == exp_over
    yield (
        "doc_minhash_estimate_error/over_threshold",
        ok_over,
        f"got={r20['n_est_over_threshold']} expected={exp_over}",
    )
    # mean uses integer DIV, so the base SUM is only bracketed:
    # sum1 in [mean1*n1, (mean1+1)*n1 - 1]
    lo = (k * k * (r1["mean_abs_err_permille"] * n1)) // exp_pairs
    hi = (k * k * ((r1["mean_abs_err_permille"] + 1) * n1 - 1)) // exp_pairs
    ok_mean = lo <= r20["mean_abs_err_permille"] <= hi
    yield (
        "doc_minhash_estimate_error/mean_err",
        ok_mean,
        f"got={r20['mean_abs_err_permille']} bound=[{lo}, {hi}]",
    )


CHECKS = [
    check_minhash_estimate_error,
    check_exact_substring,
    check_multimodal_neardup,
    check_curation,
    check_curation_v2,
    check_dedup_clusters,
]


def run_invariants(spark, registry, k: int, sf20: str) -> int:
    failures = 0
    for fn in CHECKS:
        try:
            for name, ok, detail in fn(spark, registry, k, sf20):
                print(f"{name}: {'OK' if ok else 'FAIL'} ({detail})")
                if not ok:
                    failures += 1
        except Exception as exc:
            failures += 1
            msg = str(exc).splitlines()[0][:200]
            print(f"{fn.__name__}: ERROR ({msg})")
        spark.catalog.clearCache()
    print(f"\nstress invariants k={k}: {len(CHECKS)} checks, {failures} failures")
    return failures
