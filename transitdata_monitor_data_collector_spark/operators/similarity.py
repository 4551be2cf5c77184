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
