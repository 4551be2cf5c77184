"""Deduplication operators for LLM training-data pipelines (charter
extension; the reference observes dedup as a first-class pipeline concept —
the ``raw`` vs ``raw-deduplicated`` Pulsar topics,
src/pulsar_data_collector.py:22-33).

Scale design (100 TB):
- exact dedup: one hash-shuffle on the content hash — the minimum possible.
- n-gram Jaccard: inverted-index self-join on shingles (NOT an all-pairs
  cross join). Skew control: very frequent shingles ("stop shingles") are
  dropped before the join — they only generate candidate pairs that exact
  verification would re-check anyway.
- MinHash+LSH: signatures via cheap integer hashing (xxhash64 + universal
  rehash, no Python), banded bucketing so the self-join only happens within
  buckets, then EXACT Jaccard verification of candidates — so LSH tuning
  affects recall/cost, never output values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from transitdata_monitor_data_collector_spark.functions.text import (
    content_fingerprint,
    word_shingles,
)

# Mersenne prime 2^31-1: universal-hash modulus keeping all arithmetic
# far from int64 overflow (Spark 4 ANSI mode errors on overflow).
_P = 2_147_483_647

#: Process-wide default for ``dedup_exact_first`` (the r8 exact-duplicate
#: collapse before the quadratic candidate/verify work). "auto" = decide
#: per corpus via the distinct-content-ratio precheck below; True/False
#: force it (the bench-attribution tool, tools/attrib_collapse.py, times
#: the UNCHANGED registry builders under each forced shape).
DEDUP_EXACT_FIRST_DEFAULT: bool | str = "auto"

#: Auto mode collapses only when the corpus is duplicate-heavy enough to
#: pay for the rep-map + expansion joins: distinct-content ratio at or
#: below this threshold (>= ~10% exact copies). Attribution at sf0.1
#: (r9, tools/attrib_collapse.py) measured the collapse costing 1.3-1.6x
#: on a dedup-LIGHT corpus (doc_dedup_clusters 6.10 s vs 3.74 s cold)
#: while the k=20 sweep showed it is the difference between completing
#: and a 38 GB spill on a duplicate-heavy one — so the cheap precheck
#: (one approx-distinct aggregate over the content hash, partial-agg'd
#: map-side, no shingling) picks the shape the data deserves.
DEDUP_COLLAPSE_MAX_DISTINCT_RATIO = 0.9


from transitdata_monitor_data_collector_spark.partitioning import (  # noqa: E402
    spread_small_input,
)


#: Memo for the auto-mode precheck, keyed by (semanticHash(df), col).
#: The precheck is an EAGER Spark job at DataFrame-construction time —
#: within one pipeline build (doc_curation runs two dedup stages over the
#: same corpus) or across the exploratory explain/audit tooling it would
#: otherwise re-scan the corpus per call. Sharing by input-frame identity
#: is SAFE even across a hash collision or a file rewritten under the
#: same plan: the decision only picks the plan SHAPE — both shapes are
#: output-identical (tests/test_dedup_cap.py pins the equivalence).
#: bench.py clears this between timed samples so each sample still bills
#: its own precheck (the honest per-build cost at 100 TB).
from collections import OrderedDict  # noqa: E402

_PRECHECK_MEMO: OrderedDict = OrderedDict()
_PRECHECK_MEMO_MAX = 64


def clear_precheck_memo() -> None:
    """Drop memoized auto-collapse decisions (bench/test hook — see
    :data:`_PRECHECK_MEMO`)."""
    _PRECHECK_MEMO.clear()


def _precheck_job(df: DataFrame, key_expr) -> tuple[int, int]:
    """The actual eager aggregate (split out so tests can count runs):
    one pass, approx_count_distinct partial-aggregates map-side, 2-long
    driver result. Returns the raw ``(n_rows, n_distinct)`` pair — the
    threshold is applied by the CALLER on every lookup, so the memo
    stays valid when ``DEDUP_COLLAPSE_MAX_DISTINCT_RATIO`` is reassigned
    between calls (r10 ADVICE: a (hash, col)-keyed boolean memo served
    stale decisions computed under the old threshold)."""
    r = df.agg(
        F.count("*").alias("n"),
        F.approx_count_distinct(key_expr, 0.02).alias("d"),
    ).first()
    return int(r["n"]), int(r["d"])


def _apply_collapse_threshold(counts: tuple[int, int]) -> bool:
    n, d = counts
    return bool(n > 0 and d <= DEDUP_COLLAPSE_MAX_DISTINCT_RATIO * n)


def _distinct_ratio_precheck(df: DataFrame, key_expr, col_name: str) -> bool:
    """Memoized auto-mode precheck over an arbitrary content key (md5 of
    the text for the shingle pipelines, xxhash64 of the vector for
    RP-LSH). Streaming inputs cannot run an eager aggregate at plan-build
    time — callers must force a shape explicitly."""
    if df.isStreaming:
        raise ValueError(
            "auto dedup_exact_first needs an eager distinct-ratio scan, "
            "which a streaming DataFrame cannot run at plan-build time — "
            "pass dedup_exact_first=True/False explicitly"
        )
    try:
        memo_key = (df.semanticHash(), col_name)
    except Exception:  # foreign/mock frames: fall through, never break
        memo_key = None
    if memo_key is not None and memo_key in _PRECHECK_MEMO:
        _PRECHECK_MEMO.move_to_end(memo_key)
        return _apply_collapse_threshold(_PRECHECK_MEMO[memo_key])
    counts = _precheck_job(df, key_expr)
    if memo_key is not None:
        _PRECHECK_MEMO[memo_key] = counts
        while len(_PRECHECK_MEMO) > _PRECHECK_MEMO_MAX:
            _PRECHECK_MEMO.popitem(last=False)
    return _apply_collapse_threshold(counts)


def _should_collapse(df: DataFrame, text_col: str) -> bool:
    """The auto-mode precheck: collapse exact duplicates first only when
    the corpus is duplicate-heavy (distinct-content ratio <=
    ``DEDUP_COLLAPSE_MAX_DISTINCT_RATIO``). One memoized aggregate over
    md5(text); the collapse path it decides re-derives the same hash
    anyway."""
    return _distinct_ratio_precheck(
        df, F.md5(F.col(text_col)), text_col
    )


def _resolve_collapse(
    dedup_exact_first: bool | str | None, df: DataFrame, text_col: str
) -> bool:
    v = (
        DEDUP_EXACT_FIRST_DEFAULT
        if dedup_exact_first is None
        else dedup_exact_first
    )
    if v == "auto":
        return _should_collapse(df, text_col)
    return bool(v)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact normalized content hash.

    One shuffle on the 128-bit content hash; at 100 TB this is a plain
    hash-aggregate, no skew concern (hashes are uniform).
    """
    h = content_fingerprint(F.col(text_col)).alias("content_md5")
    return (
        df.select(h, F.col(id_col), F.col(text_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("set_size", F.size("shingles"))


#: Default document-frequency cap for the inverted-index candidate join.
#: A shingle shared by k docs contributes O(k²) candidate rows; capping df
#: bounds the per-shingle blowup while exact verification (below) keeps
#: every emitted pair's Jaccard exact. A pair is missed only if EVERY one
#: of its common shingles is hotter than the cap — i.e. the docs overlap
#: solely in corpus-wide boilerplate, which is the pair class a near-dup
#: pass deliberately ignores (same trade-off as MinHash banding).
DEFAULT_MAX_SHINGLE_FREQ = 1000


def _jaccard_pairs_over_sets(
    sets: DataFrame,
    threshold: float,
    max_shingle_freq: int | None,
) -> DataFrame:
    """Candidate + verify over a (doc_id, shingles, set_size) table.

    plan: explode shingles -> drop shingles with df > ``max_shingle_freq``
    (candidate generation ONLY — the skew/blowup guard) -> self-join on
    shingle (equi-join, shuffle on shingle) -> DISTINCT candidate pairs ->
    exact verify by joining each candidate back to both full shingle sets
    and computing |A∩B| with ``array_intersect`` -> |A∩B|/(|A|+|B|-|A∩B|).
    """
    exploded = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_shingle_freq is not None:
        freq = exploded.groupBy("shingle").agg(F.count("*").alias("df"))
        exploded = (
            exploded.join(freq, "shingle")
            .filter(F.col("df") <= max_shingle_freq)
            .drop("df")
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("set_size").alias("size_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("set_size").alias("size_b"),
    )
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common / (
        F.col("size_a") + F.col("size_b") - n_common
    ).cast("double")
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
    dedup_exact_first: bool | str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs, candidate + verify
    (see :func:`_jaccard_pairs_over_sets` for the inverted-index plan).

    Because verification uses the FULL uncapped sets, the df cap never
    alters a reported jaccard value; it can only skip pairs whose every
    common shingle exceeds the cap (boilerplate-only overlap). Pass
    ``max_shingle_freq=None`` to disable the guard (exhaustive mode for
    small corpora / oracle comparison).

    ``dedup_exact_first`` (default): Jaccard is a function of the shingle
    SET, not the copy — so exact-duplicate sets collapse to one
    representative BEFORE the quadratic candidate/verify work, and pairs
    expand back to doc ids afterwards through integer-only joins. On a
    duplicate-heavy corpus this is the difference between verifying
    O(distinct²) array pairs and O(docs²): the k=20 stress corpus (20
    exact copies of every doc) spilled the naive verify join past a
    252 GB disk, while the collapsed form verifies exactly the base
    corpus's pairs and only the final (int, int, double) expansion sees
    the multiplied output. The df cap then counts DISTINCT contents, not
    copies — strictly closer to exhaustive behavior.
    """
    dedup_exact_first = _resolve_collapse(dedup_exact_first, df, text_col)
    if not dedup_exact_first:
        sets = shingle_sets(
            spread_small_input(df, id_col), text_col, id_col, n
        )
        return _jaccard_pairs_over_sets(
            sets.cache(), threshold, max_shingle_freq
        )
    rep_docs, rep_key, members = _collapse_exact_docs(df, text_col, id_col)
    rep_sets = shingle_sets(
        spread_small_input(rep_docs, id_col), text_col, id_col, n
    ).cache()
    rep_pairs = _jaccard_pairs_over_sets(rep_sets, threshold, max_shingle_freq)
    # empty-set docs never pair (no shingle rows -> no candidates), so
    # their duplicate groups must not expand into 1.0-jaccard pairs
    ok = rep_sets.filter(F.col("set_size") > 0).select("doc_id")
    rep_key_ok = rep_key.join(ok, "doc_id", "left_semi")
    members_ok = members.join(rep_key_ok.select("ckey"), "ckey", "left_semi")
    return _expand_content_pairs(rep_pairs, rep_key_ok, members_ok)


def _collapse_exact_docs(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Collapse exact-duplicate documents to one representative (min id)
    per RAW text (md5 of the text byte-for-byte — raw-equal implies
    shingle-set-equal under any tokenization, so the collapse is sound
    without knowing the shingling's normalization). Returns (rep_docs,
    reps, members): the representative documents (for downstream
    shingling — the expensive per-row work shrinks to distinct texts),
    the (doc_id, ckey) rep map, and the (ckey, doc_id) full-membership
    map. All three are narrow (two columns + the rep texts); no shingle
    array is ever keyed, shuffled, or joined here."""
    keyed = df.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("ckey")
    )
    reps = keyed.groupBy("ckey").agg(F.min("doc_id").alias("doc_id"))
    rep_docs = df.join(
        reps.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )
    return rep_docs, reps.select("doc_id", "ckey"), keyed.select("ckey", "doc_id")


def _expand_content_pairs(
    rep_pairs: DataFrame,
    rep_key: DataFrame,
    members: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    val_col: str = "jaccard",
    intra_val=None,
) -> DataFrame:
    """Expand representative-level (a, b, value) pairs back to doc-id
    level through integer-only joins: every cross-content pair of copies
    inherits the content pair's value, and identical contents pair at
    ``intra_val`` — default 1.0, which passes any threshold <= 1 (true
    for jaccard AND cosine of identical inputs); the simhash pipeline
    passes hamming 0."""
    if intra_val is None:
        intra_val = F.lit(1.0)
    cross = (
        rep_pairs.join(
            rep_key.select(
                F.col("doc_id").alias(a_col), F.col("ckey").alias("ka")
            ),
            a_col,
        )
        .join(
            rep_key.select(
                F.col("doc_id").alias(b_col), F.col("ckey").alias("kb")
            ),
            b_col,
        )
        .join(
            members.select(
                F.col("ckey").alias("ka"), F.col("doc_id").alias("ida")
            ),
            "ka",
        )
        .join(
            members.select(
                F.col("ckey").alias("kb"), F.col("doc_id").alias("idb")
            ),
            "kb",
        )
        .select(
            F.least("ida", "idb").alias(a_col),
            F.greatest("ida", "idb").alias(b_col),
            val_col,
        )
    )
    intra = (
        members.select("ckey", F.col("doc_id").alias(a_col))
        .join(members.select("ckey", F.col("doc_id").alias(b_col)), "ckey")
        .filter(F.col(a_col) < F.col(b_col))
        .select(a_col, b_col, intra_val.alias(val_col))
    )
    return cross.unionByName(intra)


def cross_corpus_neardup(
    new_df: DataFrame,
    base_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Incremental dedup: exact n-gram Jaccard matches of NEW docs against
    an EXISTING corpus — (doc_id, base_id, jaccard) for every cross pair
    at or above the threshold. No self-joins on either side: the inverted
    index joins new-side shingles to base-side shingles only.

    The 100 TB shape of "dedup this crawl against the training set": the
    new batch is typically orders of magnitude smaller than the base, so
    its exploded shingle index is the broadcast/small side and the base
    corpus is never self-paired (the quadratic term vanishes by
    construction)."""
    new_sets = shingle_sets(
        spread_small_input(new_df, id_col), text_col, id_col, n
    ).cache()
    base_sets = shingle_sets(base_df, text_col, id_col, n).cache()
    ne = new_sets.select("doc_id", F.explode("shingles").alias("shingle"))
    be = base_sets.select(
        F.col("doc_id").alias("base_id"), F.explode("shingles").alias("shingle")
    )
    common = (
        ne.join(be, "shingle")
        .groupBy("doc_id", "base_id")
        .agg(F.count("*").alias("n_common"))
    )
    sn = new_sets.select("doc_id", F.col("set_size").alias("size_new"))
    sb = base_sets.select(
        F.col("doc_id").alias("base_id"), F.col("set_size").alias("size_base")
    )
    jac = F.col("n_common") / (
        F.col("size_new") + F.col("size_base") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sn, "doc_id")
        .join(sb, "base_id")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "base_id", "jaccard")
    )


def with_shingle_hashes(sets: DataFrame) -> DataFrame:
    """Add the per-shingle xxhash64-mod-P array. Callers that cache the
    shingle-set frame should cache AFTER this so the string hashing is paid
    once, not once per downstream signature expression."""
    return sets.withColumn(
        "sh_hashes",
        F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_P))),
    )


def minhash_signatures(sets: DataFrame, num_hashes: int = 64) -> DataFrame:
    """(doc_id, mh array<long>) from a ``shingle_sets`` frame.

    Universal-hash family h_i(x) = (a_i*x + b_i) mod P over the per-shingle
    hash array. The minima are computed in ONE Arrow-vectorized Pandas UDF
    (numpy): num_hashes independent ``array_min(transform(...))`` Column
    expressions evaluate interpreted and rescan the shingle array per
    hash — the dense rehash+min is the same "vectorized linear algebra"
    shape as the RP-LSH signature matmul (operators/similarity.py) and is
    ~10x faster in numpy. Still a narrow map stage: no explode, no
    shuffle — at 100 TB signatures never shuffle a shingle occurrence.
    All products stay < 2^62 (no int64 overflow; inputs are < P = 2^31).
    Docs with empty shingle sets are dropped (no signature).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if "sh_hashes" not in sets.columns:
        sets = with_shingle_hashes(sets)

    A = np.array(
        [(2 * i + 1) * 40_503 % _P for i in range(num_hashes)], dtype=np.int64
    )  # odd multipliers, fixed seeds
    B = np.array(
        [(i * 1_299_721 + 15_485_863) % _P for i in range(num_hashes)],
        dtype=np.int64,
    )

    def _mh(hs):
        arrs = [np.asarray(a, dtype=np.int64) for a in hs]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series([np.array([], dtype=np.int64)] * len(arrs))
        flat = np.concatenate(arrs)  # (total,)
        offs = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        out = np.full((len(arrs), num_hashes), _P, dtype=np.int64)
        nonempty = lens > 0
        ne_offs = offs[nonempty]
        # one pass per hash function keeps peak memory at O(total), not
        # O(total * num_hashes); reduceat takes the min per document
        for i in range(num_hashes):
            out[nonempty, i] = np.minimum.reduceat(
                (flat * A[i] + B[i]) % _P, ne_offs
            )
        return pd.Series(list(out))

    # legacy (no-type-hint) form: `from __future__ import annotations`
    # stringifies hints, which pandas_udf's hint inference can't resolve
    mh = pandas_udf(_mh, "array<long>")
    return sets.filter(F.col("set_size") > 0).select(
        "doc_id", mh(F.col("sh_hashes")).alias("mh")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash-LSH.

    64 hashes, bands of 2 → P(candidate | J) = 1-(1-J^2)^32: J=0.6 is
    caught with p ≈ 1-6e-7 — recall is effectively 1 at the verification
    threshold, so downstream exact verification determines the output.
    Plan shape: row-wise signatures (narrow, no shuffle) -> explode 32
    tiny band keys -> equi-self-join on (band, key). No cross join, and
    the only shuffled rows are (doc_id, band, key) triples.
    """
    if sets is None:
        sets = shingle_sets(df, text_col, id_col, n)
    sigs = minhash_signatures(sets, num_hashes)
    num_bands = num_hashes // rows_per_band
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            # hash of the band's signature slice (array hashing is
            # supported natively) — one 64-bit key per band
            F.hash(
                F.slice(F.col("mh"), band * rows_per_band + 1, rows_per_band)
            ).alias("key"),
        )
        for band in range(num_bands)
    ]
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    dedup_exact_first: bool | str | None = None,
) -> DataFrame:
    """MinHash-LSH candidates + EXACT Jaccard verification: same output as
    brute-force Jaccard (the DuckDB oracle), at inverted-index cost only
    within LSH buckets.

    The input is repartitioned BEFORE the CPU-heavy row-wise shingling —
    a small text corpus often arrives as one file split, which would pin
    the whole narrow pipeline to one core; the (doc_id-hashed) exchange is
    tiny relative to the compute it parallelizes. The shingle+hash frame
    is computed once, cached, and shared by signature generation and
    verification.

    ``dedup_exact_first`` (default): identical shingle sets produce
    identical signatures, so k exact copies of a document collide in
    every band — the hot-bucket straggler the k=20 sweep observed, plus
    k²-multiplied verify pairs carrying full shingle arrays. Collapsing
    to one representative per distinct set before banding removes both
    (same technique and expansion joins as :func:`ngram_jaccard_pairs`);
    LSH recall applies to the content pair once instead of k² times."""

    def _verify(candidates, sets):
        sa = sets.select(
            F.col("doc_id").alias("doc_a"),
            F.col("shingles").alias("sh_a"),
            F.col("set_size").alias("size_a"),
        )
        sb = sets.select(
            F.col("doc_id").alias("doc_b"),
            F.col("shingles").alias("sh_b"),
            F.col("set_size").alias("size_b"),
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        jac = inter / (F.col("size_a") + F.col("size_b") - inter).cast(
            "double"
        )
        return (
            candidates.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    dedup_exact_first = _resolve_collapse(dedup_exact_first, df, text_col)
    if not dedup_exact_first:
        spread = spread_small_input(df, id_col)
        sets = with_shingle_hashes(
            shingle_sets(spread, text_col, id_col, n)
        ).cache()
        return _verify(
            minhash_lsh_candidates(df, text_col, id_col, n, sets=sets), sets
        )
    rep_docs, rep_key, members = _collapse_exact_docs(df, text_col, id_col)
    rep_sets = with_shingle_hashes(
        shingle_sets(spread_small_input(rep_docs, id_col), text_col, id_col, n)
    ).cache()
    candidates = minhash_lsh_candidates(df, text_col, id_col, n, sets=rep_sets)
    rep_pairs = _verify(candidates, rep_sets)
    ok = rep_sets.filter(F.col("set_size") > 0).select("doc_id")
    rep_key_ok = rep_key.join(ok, "doc_id", "left_semi")
    members_ok = members.join(rep_key_ok.select("ckey"), "ckey", "left_semi")
    return _expand_content_pairs(rep_pairs, rep_key_ok, members_ok)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word unigrams: per bit, sum +1/-1 weighted by
    token hash bit, sign -> bit. Pure column expressions: tokens ->
    xxhash64 -> per-bit majority via aggregate over the token array
    (no shuffle needed — embarrassingly parallel row-wise op; small
    single-split inputs are spread across cores first)."""
    df = spread_small_input(df, id_col)
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_cols = []
    for bit in range(64):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(
            F.when(votes > 0, F.lit(1).cast("long") * (2**bit if bit < 63 else -(2**63)))
            .otherwise(0)
            .alias(f"b{bit}")
        )
    # sum the bit contributions into one signed 64-bit value
    sig = bit_cols[0]
    for c in bit_cols[1:]:
        sig = sig + c
    return df.select(F.col(id_col).alias("doc_id"), sig.alias("simhash"))


def simhash_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 60,
) -> DataFrame:
    """SimHash over word unigrams with a CROSS-ENGINE token hash: the first
    15 hex chars of md5 (60 bits, fits a signed long) instead of xxhash64,
    so a DuckDB oracle can reproduce signatures bit-for-bit
    (``('0x'||substr(md5(t),1,15))::BIGINT`` ≡ ``int(md5(t)[:15], 16)``).

    The per-bit ±1 vote tally is dense per-row integer algebra — the same
    "vectorized linear algebra" exception as the MinHash / RP-LSH
    signature stages: one Arrow-batched Pandas UDF tokenizes (the Python
    model of ``split(trim(lower(s)), '\\s+')``), hashes each token once
    with hashlib md5, and tallies all 60 bit votes in a single
    bit-unpack + ``reduceat`` numpy pass (~3x the interpreted
    Column-aggregate formulation). Still row-wise and shuffle-free; the
    xxhash64 Column variant (:func:`simhash`) remains for when oracle
    parity isn't needed."""
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # Java's \s is ASCII-only ([ \t\n\x0B\f\r]) while Python's is
    # Unicode-aware, and Spark's trim() strips SPACES only — model both
    # exactly so signatures match the Column/DuckDB tokenization
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")
    bit_idx = np.arange(n_bits, dtype=np.uint64)

    def _sig(texts):
        out = np.zeros(len(texts), dtype=np.int64)
        hash_lists = []
        lens = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            # exact Python model of split(trim(lower(text)), '\s+'):
            # Spark's split keeps the leading "" for empty input
            toks = ws.split((t or "").lower().strip(" "))
            hs = np.fromiter(
                (
                    int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                    for tok in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            hash_lists.append(hs)
            lens[i] = len(hs)
        flat = np.concatenate(hash_lists) if hash_lists else np.empty(0, np.uint64)
        # (total, n_bits) ±1 votes, summed per doc in one reduceat pass
        bits = ((flat[:, None] >> bit_idx) & 1).astype(np.int64)
        votes = 2 * bits - 1
        offs = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        tallies = np.add.reduceat(votes, offs, axis=0)  # (docs, n_bits)
        out = ((tallies > 0).astype(np.int64) << bit_idx.astype(np.int64)).sum(
            axis=1
        )
        return pd.Series(out)

    # legacy (no-type-hint) form: `from __future__ import annotations`
    # stringifies hints, which pandas_udf's hint inference can't resolve
    sig = pandas_udf(_sig, "long")
    df = spread_small_input(df, id_col)
    return df.select(
        F.col(id_col).alias("doc_id"), sig(F.col(text_col)).alias("simhash")
    )


def simhash_sql(n_bits: int = 60) -> str:
    """DuckDB expression computing the same signature as
    :func:`simhash_md5` over a token-hash list column ``hs``."""
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) "
        f"& 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"({terms})"


def simhash_banded_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
    n_bits: int = 60,
    dedup_exact_first: bool | str | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= ``max_hamming`` —
    EXACT (not probabilistic) via the pigeonhole band trick: split the
    signature into ``n_bands`` disjoint bit ranges; with
    ``n_bands > max_hamming`` any qualifying pair has all its differing
    bits inside at most ``max_hamming`` bands, so at least one band is
    IDENTICAL. Candidates are therefore an equi-self-join on
    (band, band_bits) with guaranteed recall 1, then the exact hamming
    check (``bit_count(xor)``) filters. Plan shape mirrors MinHash-LSH:
    narrow signature map -> explode n_bands key rows -> equi-join ->
    exact verify. No cross join at any scale."""
    if n_bands <= max_hamming:
        raise ValueError(
            f"pigeonhole needs n_bands > max_hamming, got {n_bands} <= {max_hamming}"
        )
    # identical texts have identical signatures, so k exact copies
    # collide in EVERY band (k^2 candidate pressure — same class the
    # MinHash/Jaccard/RP-LSH pipelines collapse away, r8/r9): on a
    # duplicate-heavy corpus, band only the distinct-content reps and
    # expand pairs back afterwards; intra-copy pairs carry hamming 0.
    # (No empty-set guard needed: EVERY doc has a simhash, and identical
    # texts legitimately pair at hamming 0 in the brute-force oracle.)
    if _resolve_collapse(dedup_exact_first, df, text_col):
        rep_docs, rep_key, members = _collapse_exact_docs(
            df, text_col, id_col
        )
        rep_pairs = simhash_banded_neardup_pairs(
            rep_docs, text_col, id_col, max_hamming, n_bands, n_bits,
            dedup_exact_first=False,
        )
        return _expand_content_pairs(
            rep_pairs, rep_key, members,
            val_col="hamming", intra_val=F.lit(0).cast("long"),
        )
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    # cache: the signature frame feeds the banded self-join (both sides)
    # AND the exact-verify joins — without it the md5+vote pipeline would
    # evaluate 4x (tiny frame: one long per doc)
    sigs = simhash_md5(df, text_col, id_col, n_bits).cache()
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.shiftright("simhash", band * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("key"),
        )
        for band in range(n_bands)
    ]
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    x = banded.alias("x")
    y = banded.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_summary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-level dedup report: exact-dup groups and survivor counts."""
    groups = exact_dedup(df, text_col, id_col)
    return groups.agg(
        F.count("*").alias("n_unique"),
        F.sum("n_copies").alias("n_docs"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)).alias("n_dup_groups"),
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy-dedup cluster assignment: (doc_id, cluster_id, is_kept).

    Near-dup PAIRS don't dedupe a corpus — transitive groups must collapse
    to one survivor (A~B and B~C puts A, B, C in one cluster even when
    (A, C) is below the pair threshold). Pipeline: MinHash-LSH pairs with
    exact Jaccard verification (:func:`minhash_lsh_neardup_pairs`) ->
    distributed connected components (min-label propagation,
    ``operators/components.py``) -> cluster_id = min doc_id of the
    component, is_kept = (doc_id == cluster_id). Every doc appears in the
    output; unmatched docs are their own singleton cluster.

    At 100 TB: the pair stage is the bucketed LSH plan; the component
    stage adds O(cluster diameter) join rounds over ONLY the pair edges
    (tiny relative to the corpus), never over the documents themselves.
    """
    from transitdata_monitor_data_collector_spark.operators.components import (
        connected_components,
    )

    pairs = minhash_lsh_neardup_pairs(df, text_col, id_col, n, threshold)
    nodes = df.select(F.col(id_col).alias("doc_id"))
    labels = connected_components(
        pairs.select("doc_a", "doc_b"), nodes=nodes, src="doc_a", dst="doc_b"
    )
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("id")).alias("is_kept"),
    )
