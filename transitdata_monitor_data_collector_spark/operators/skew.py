"""Skew-mitigation helpers: salting for hot keys.

The engine's first line of defense is AQE (``skewJoin.enabled`` is on in
``session.py`` — sort-merge partitions are split at runtime), and hot-key
*aggregation* is already two-phase (partial map-side combine). These
helpers cover the residual cases AQE can't fix:

- a shuffle-hash/stream-side hot key in a large-large join
  (:func:`salted_join`) — the hot key's rows land on one task; salting
  fans them over ``n_salts`` tasks at the cost of replicating the other
  side ``n_salts``×;
- high-cardinality-accumulator aggregation (e.g. ``collect_set``,
  exact distinct) where map-side combine doesn't shrink the hot key
  (:func:`salted_two_phase_agg`).

The reference's own skew anchor: one topic filter carries ~1,833 msg/s
while others are near-idle (MqttTopicMonitorListener.java:31-32) — with
(broker, topic_filter) as the aggregation key, that filter IS the hot key
at cluster scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_join", "salted_two_phase_agg"]


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the whole row —
    stable across retries (no rand(), which would break task re-execution
    exactly-once semantics)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has hot keys: salt the left side, replicate
    the right side ``n_salts``x (explode over the salt range), join on
    (key, salt). For the supported join types the result is identical to
    ``left.join(right, on, how)``; the hot key's probe work spreads over
    ``n_salts`` tasks.

    Only left-preserving joins are supported ('inner', 'left'/'left_outer',
    'left_semi', 'left_anti'): the right side is replicated, so a
    right/full outer join would emit every UNMATCHED right row
    ``n_salts``x — silently wrong. Those shapes need the mirrored
    construction (salt right, replicate left); raise instead of guessing.

    Use when BOTH sides are too big to broadcast AND AQE's skew-join
    splitting is unavailable (e.g. shuffle-hash join path). Cost model:
    right side shuffles ``n_salts``x its size — pick n_salts ≈ (hot-key
    rows / rows-per-healthy-partition)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}; "
            f"got {how!r} — a replicated right side would duplicate unmatched "
            "right rows in right/full outer joins"
        )
    salted_left = with_salt(left, n_salts)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_left.join(replicated_right, [on, "_salt"], how)
    return out.drop("_salt")


def salted_two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    exprs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation through an explicit salt stage for aggregates
    whose partial state does NOT collapse map-side (count_distinct,
    collect_set): phase 1 aggregates per (keys, salt) — the hot key's
    state splits across ``n_salts`` reducers — phase 2 merges the partial
    results per key.

    ``exprs`` maps output column name -> a dict of the two phases:
    currently supports the mergeable builtin shapes sum/count/min/max and
    collect_set-of-sets via flatten+distinct.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[v["partial"].alias(f"__p_{k}") for k, v in exprs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[v["merge"](F.col(f"__p_{k}")).alias(k) for k, v in exprs.items()]
    )
