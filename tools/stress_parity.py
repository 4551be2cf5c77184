"""Large-SF cross-engine determinism stress (round-4 VERDICT item 9).

/root/testdata tops out at sf0.1, and the cross-engine-determinism bug
class demonstrably scales with data (two found at sf0.1 in r3). This tool
builds a ~sf0.5 stress set by replicating the DRIVER'S sf0.1 tables k
times with consistently shifted keys (never synthesizing new value
distributions), then runs the most determinism-sensitive registry queries
Spark-vs-DuckDB exactly like the parity suite.

The replication is itself a stress design:

- fact keys (o_orderkey/l_orderkey, event_id, doc_id, vec_id) shift by
  ``replica * max_key`` so joins stay consistent and keys stay unique;
- dimensions (region/nation/part/supplier/customer) are NOT replicated —
  fact/dim fan-out grows k-fold (hot-key pressure);
- documents/embeddings replicate with IDENTICAL text/vectors under new
  ids: k-fold exact duplicates and exact score TIES, the worst case for
  dedup/top-k tie-breaking (the r3 ulp-tiebreak bug class).

Usage:  python tools/stress_parity.py [k] [query ... | --all]
``--all`` sweeps EVERY oracle-backed registry query (minus a small skip
list of quadratic-oracle entries whose DuckDB side is too slow at k=5).
Writes parquet under spark-warehouse/stress_sf/ (gitignored cache; rebuilt
when k changes) and prints one result line per query + a summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "spark-warehouse", "stress_sf")

#: replicated tables -> key columns shifted by replica * (max_key + 1)
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

#: the determinism-sensitive slice: float-heavy aggregation, libm-derived
#: quantities, iterative training replay, tie-break-exposed top-k, and the
#: dedup family over now-heavily-duplicated corpora
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q9_product_type_profit",
    "q11_important_stock",
    "events_corr_value_hour",
    "events_anomaly_zscore",
    "events_benford_deviation",
    "promql_histogram_quantile",
    "timeseries_ewma",
    "text_zipf_profile",
    "text_char_entropy",
    "text_collocations_pmi",
    "doc_dsir_importance",
    "doc_perplexity_unigram",
    "doc_perplexity_kneser_ney",
    "doc_ccnet_perplexity_buckets",
    "doc_exact_dedup",
    "doc_minhash_lsh_neardup",
    "emb_cosine_topk",
    "emb_semantic_dedup",
    "emb_ivf_recall_report",
]


def build_stress_dir(k: int) -> str:
    import duckdb

    marker = os.path.join(OUT, f"_BUILT_k{k}")
    if os.path.exists(marker):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    for old in os.listdir(OUT):
        p = os.path.join(OUT, old)
        if os.path.isfile(p):
            os.unlink(p)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in FACTS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        shifts = {
            c: con.execute(f"SELECT max({c}) + 1 FROM {src}").fetchone()[0]
            for c in keys
        }
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        selects = []
        for i in range(k):
            proj = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in keys else c for c in cols
            )
            selects.append(f"SELECT {proj} FROM {src}")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    with open(marker, "w") as f:
        f.write("ok")
    return OUT


def run(k: int, queries: list[str]) -> int:
    import duckdb

    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.session import get_spark

    # r6 VERDICT item 6: name the oracle engine build in every stress log —
    # the r5/r6 gate divergence was a DuckDB-version behavior difference
    # invisible without knowing which build each side ran.
    print(f"oracle engine: duckdb {duckdb.__version__}")
    sf_dir = build_stress_dir(k)
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        # 5x sf0.1 with window/collect-heavy plans needs real heap — the
        # 1g local default OOMs (observed on the full sweep)
        extra_conf={
            "spark.driver.memory": "24g",
            # a 280-query sweep in ONE context accumulates every query's
            # shuffle files until the JVM happens to GC the RDD handles;
            # at k=20 that exhausted the disk mid-sweep. Force the
            # ContextCleaner to run on a clock.
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )
    registry = load_all()
    con = duckdb.connect()
    for t in list(FACTS) + DIMS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in queries:
        q = registry[name]
        if q.oracle is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        import datetime as _dt

        def norm(v):
            # DATE vs TIMESTAMP-at-midnight is a type nuance the driver's
            # hash normalizes (string-cast); mirror it here
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                return _dt.datetime(v.year, v.month, v.day)
            return v

        def skey(row):
            # None-safe, type-stable ordering (rows may contain NULLs and
            # mixed types; we only need the SAME order on both sides —
            # equality is still checked on the raw tuples)
            return tuple((v is None, str(v)) for v in row)

        try:
            sdf = q.build(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(norm(r[c]) for c in scols) for r in sdf.collect()),
                key=skey,
            )
        except Exception as exc:  # survive and report; keep sweeping
            failures += 1
            msg = str(exc).splitlines()[0][:200]
            print(f"{name}: ERROR (spark side: {msg})")
            continue
        try:
            ores = con.execute(q.oracle)
            ocols = sorted(d[0] for d in ores.description)
            all_rows = ores.fetchall()
        except Exception as exc:  # oracle-side failure must not kill the
            failures += 1  # sweep (events_anomaly_zscore's sqrt(<0) did)
            msg = str(exc).splitlines()[0][:200]
            print(f"{name}: ERROR (oracle side: {msg})")
            continue
        names = [d[0] for d in ores.description]
        idx = [names.index(c) for c in ocols]
        orows = sorted(
            (tuple(norm(r[i]) for i in idx) for r in all_rows), key=skey
        )
        ok_schema = scols == ocols
        ok = ok_schema and len(srows) == len(orows) and srows == orows
        if ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            failures += 1
            print(
                f"{name}: MISMATCH (schema_match={ok_schema}, "
                f"spark={len(srows)} oracle={len(orows)} rows)"
            )
            if ok_schema:
                diff = [
                    (a, b)
                    for a, b in zip(srows, orows)
                    if a != b
                ][:3]
                for a, b in diff:
                    print(f"  spark : {a}\n  oracle: {b}")
    print(f"\nstress parity k={k}: {len(queries) - failures}/{len(queries)} green")
    return failures


#: oracle side is super-linear in duplicated corpora (recursive closure /
#: all-pairs CTEs) — cost, not correctness; covered by their operator tests
SWEEP_SKIP = {
    "doc_dedup_clusters",
    "doc_curation",
    "doc_curation_v2",
    "doc_exact_substring_dedup",
    # oracle spent 30+ min single-threaded at k=5: its verification CTE is
    # quadratic inside dup-groups and replication makes every feature a
    # 5-dup group; the Spark side finished — engine posture is fine
    "multimodal_feature_neardup",
    # oracle OOM-kills the process at k=20 (it evaluates 64 signature
    # list_transforms over every duplicated doc in-process); k=10 is
    # green and the SPARK side completes k=20 standalone in ~3 min
    # (1,052,400 verified pairs) — engine posture is fine
    "doc_minhash_estimate_error",
}


def all_oracle_queries() -> list[str]:
    from transitdata_monitor_data_collector_spark.plans import load_all

    return [
        n
        for n, q in load_all().items()
        if q.oracle is not None and n not in SWEEP_SKIP
    ]


def run_invariants(k: int) -> int:
    """Spark-side value checks for the SWEEP_SKIP queries at k (r8
    VERDICT item 2): no DuckDB, the k-fold replication structure itself
    is the oracle. Logic lives in tools/stress_invariants.py."""
    from transitdata_monitor_data_collector_spark.plans import load_all
    from transitdata_monitor_data_collector_spark.session import get_spark

    from tools.stress_invariants import run_invariants as _run

    sf_dir = build_stress_dir(k)
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )
    return _run(spark, load_all(), k, sf_dir)


if __name__ == "__main__":
    args = sys.argv[1:]
    k = int(args[0]) if args and args[0].isdigit() else 5
    rest = [a for a in args if not a.isdigit()]
    if rest == ["--invariants"]:
        sys.exit(1 if run_invariants(k) else 0)
    if rest == ["--all"]:
        qs = all_oracle_queries()
    else:
        qs = rest or DEFAULT_QUERIES
    sys.exit(1 if run(k, qs) else 0)
