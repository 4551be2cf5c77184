"""Similarity search over embedding columns (charter extension).

- :func:`cosine_topk` — brute-force top-k. Scale path: Spark's
  ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-partition
  top-k then a k-sized merge on the driver; no full sort, no full shuffle.
  This IS the correct 100 TB baseline.
- :func:`cosine_neardup_pairs` — all-pairs above a threshold. Brute force
  is quadratic; at scale use :func:`rp_lsh_buckets` to cut candidates.
- :func:`rp_lsh_buckets` / :func:`ann_lsh_topk` — random-hyperplane LSH:
  deterministic literal hyperplanes folded into the plan (no broadcast
  needed), bucket join instead of cross join.

All vector math is JVM-side (``zip_with``/``aggregate``); no Python UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.functions.vectors import (
    as_double,
    cosine,
    l2_norm,
)


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows by cosine similarity to a literal query vector.

    The query vector is folded into the plan as an array literal —
    constant-folded by Catalyst, no join, no broadcast, no shuffle except
    the final k-row merge."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection).

    Normalizes once, then self-joins; O(n²) compare but linear shuffle.
    Use :func:`rp_lsh_buckets` to pre-bucket at scale."""
    normed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            as_double(F.col(vec_col)),
            lambda x: x / l2_norm(F.col(vec_col)),
        ).alias("unit"),
    )
    a = normed.alias("a")
    b = normed.alias("b")
    dot_ab = F.aggregate(
        F.zip_with(F.col("a.unit"), F.col("b.unit"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot_ab, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, no numpy
    state leakage): xorshift-ish LCG -> Box-Muller."""
    state = seed * 6364136223846793005 % (2**63)
    planes = []
    for _ in range(n_planes):
        vals = []
        while len(vals) < dim:
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
            u1 = ((state >> 11) & ((1 << 53) - 1)) / float(1 << 53)
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
            u2 = ((state >> 11) & ((1 << 53) - 1)) / float(1 << 53)
            if u1 <= 1e-12:
                continue
            r = math.sqrt(-2.0 * math.log(u1))
            vals.append(r * math.cos(2 * math.pi * u2))
            if len(vals) < dim:
                vals.append(r * math.sin(2 * math.pi * u2))
        planes.append(vals[:dim])
    return planes


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per row (sign pattern over n_planes
    literal hyperplanes). Deterministic given (dim, n_planes, seed)."""
    sig = F.lit(0).cast("long")
    v = as_double(F.col(vec_col))
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        p = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(v, p, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(d > 0, F.lit(2**i).cast("long")).otherwise(0)
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket, then
    exact cosine within it. At scale the bucket column would be a partition
    key (partition pruning turns this into a sub-scan)."""
    dim = len(query_vec)
    bucketed = rp_lsh_buckets(df, dim, n_planes, vec_col, id_col, seed)
    qsig = 0
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        d = sum(px * qx for px, qx in zip(plane, query_vec))
        if d > 0:
            qsig += 2**i
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        bucketed.filter(F.col("bucket") == qsig)
        .select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def rp_banded_candidates(
    df: DataFrame,
    dim: int,
    n_bands: int = 18,
    band_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs from BANDED random-hyperplane LSH — the
    sign-pattern analog of MinHash banding (see
    ``dedup.minhash_lsh_candidates``).

    Each band hashes the vector to a ``band_planes``-bit sign signature
    over literal hyperplanes (constant-folded into the plan — no broadcast,
    no join); rows are exploded into ``n_bands`` tiny (id, band, key)
    triples and equi-self-joined on (band, key). P(two vectors at angle
    θ agree on one plane) = 1 - θ/π, so
    P(candidate) = 1 - (1 - (1-θ/π)^band_planes)^n_bands.
    At cos >= 0.9 (θ <= 0.451 rad, p ≈ 0.8564) the defaults give a miss
    probability of (1 - 0.8564^4)^18 ≈ 9e-7 — recall is effectively 1 at
    the verification threshold, so exact verification downstream
    determines the output. No cross join anywhere; the only shuffled rows
    are the banded key triples.
    """
    planes = _hyperplanes(dim, n_bands * band_planes, seed)
    v = as_double(F.col(vec_col))
    band_structs = []
    for band in range(n_bands):
        sig = F.lit(0)
        for i in range(band_planes):
            p = planes[band * band_planes + i]
            d = F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(x) for x in p]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(d > 0, F.lit(2**i)).otherwise(0)
        band_structs.append(
            F.struct(F.lit(band).alias("band"), sig.alias("key"))
        )
    banded = df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", "bk.band", "bk.key")
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def rp_lsh_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bands: int = 18,
    band_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Banded-LSH candidates + EXACT cosine verification: same output as
    the brute-force all-pairs join (the DuckDB oracle), with the quadratic
    compare confined to LSH buckets.

    This is the 100 TB path for embedding near-dup: signatures are a
    narrow map stage, the candidate join is an equi-join on (band, key),
    and the exact cosine runs only on candidate pairs. The brute-force
    :func:`cosine_neardup_pairs` is the small-data baseline/oracle."""
    candidates = rp_banded_candidates(
        df, dim, n_bands, band_planes, vec_col, id_col, seed
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    va = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    df: DataFrame,
    n_lists: int = 16,
    max_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train IVF coarse centroids with Lloyd iterations expressed as
    DataFrame aggregations.

    Deterministic init: the ``n_lists`` rows with smallest xxhash64(id)
    (a seeded pseudo-random sample with no RNG state). Each iteration:
    assign every vector to its nearest centroid (centroids folded into the
    plan as literals — no join, no broadcast), then recompute means via
    posexplode + groupBy(cluster, dim). Only (n_lists x dim) doubles ever
    reach the driver; the data-sized work is two narrow passes + one
    aggregation per iteration — the standard distributed-KMeans shape.
    """
    from pyspark.sql import functions as F  # local alias for readability

    vecs = df.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    init_rows = (
        vecs.orderBy(F.xxhash64(F.col("id").cast("string")))
        .limit(n_lists)
        .collect()
    )
    centroids = [list(r["v"]) for r in init_rows]
    for _ in range(max_iter):
        assigned = vecs.withColumn(
            "cluster", _nearest_centroid_col(F.col("v"), centroids)
        )
        new_rows = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["mean"]
        centroids = [
            [by_cluster[c][d] for d in sorted(by_cluster[c])]
            if c in by_cluster
            else centroids[c]  # empty cluster keeps its previous centroid
            for c in range(n_lists)
        ]
    return centroids


def _nearest_centroid_col(v, centroids: list[list[float]]):
    """argmin over squared L2 distance to literal centroids — a pure
    Column expression: an array of independent distance expressions and
    ``array_position(d, array_min(d))``. (A chained when(d < best, ...)
    formulation would embed the running best TWICE per step — exponential
    expression-tree blowup; this stays linear in n_lists.)"""
    from pyspark.sql import functions as F

    dists = F.array(*[_sq_dist(v, c) for c in centroids])
    # first index of the minimum (1-based -> 0-based); ties break low-index
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _sq_dist(v, centroid: list[float]):
    from pyspark.sql import functions as F

    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Add the inverted-list id. At scale this column is the partition /
    cluster-by key of the stored index: a probe then scans only
    ``nprobe`` partitions (partition pruning does the candidate cut)."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_centroid_col(as_double(F.col(vec_col)), centroids).alias("list_id"),
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    max_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` nearest inverted lists, exact
    cosine only within them. With ``nprobe == n_lists`` this degrades to
    exact brute force (recall 1), giving a tunable recall/cost dial."""
    from pyspark.sql import functions as F

    if centroids is None:
        centroids = ivf_train_centroids(df, n_lists, max_iter, vec_col, id_col)
    order = sorted(
        range(len(centroids)),
        key=lambda i: sum(
            (a - b) * (a - b) for a, b in zip(centroids[i], query_vec)
        ),
    )
    probe = order[:nprobe]
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        assigned.filter(F.col("list_id").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )
