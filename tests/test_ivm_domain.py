"""Domain robustness of the incremental-view-maintenance state algebra
(r8 ADVICE): negative user_ids must land in their own (word, bit) slot —
Spark's ``%`` returns negative remainders and ``/``+cast truncates toward
zero, which collided negative ids into wrong bitmap words — and a
(event_type, week) key whose user_ids are all NULL must still serve with
n_users=0 (count DISTINCT semantics), not vanish through an inner join.

The invariant under test is the IVM contract itself:
merge(state(base), state(delta)) == full recompute, on a fixture that
exercises both edge domains.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.plans.relational import (
    ivm_bitmap_state,
    ivm_merge,
    ivm_scalar_state,
)

_W1 = datetime.date(2024, 1, 1)
_W2 = datetime.date(2024, 1, 8)


def _tagged(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, week date, centi long, user_id long"
    )


def _recompute(df):
    return (
        df.groupBy("event_type", "week")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("centi").cast("long").alias("sum_centi"),
            F.min("centi").cast("long").alias("min_centi"),
            F.max("centi").cast("long").alias("max_centi"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type", "week")
    )


def test_ivm_merge_handles_negative_and_null_user_ids(spark):
    rows = [
        # negative ids around a word boundary: -1 and -33 are DIFFERENT
        # users in different words; -1 and 31 must NOT collide
        ("a", _W1, 10, -1),
        ("a", _W1, 20, -33),
        ("a", _W1, 30, 31),
        ("a", _W1, 40, -1),  # dup of -1: counts once
        # all-NULL key: must serve n_users=0, not drop
        ("b", _W1, 5, None),
        ("b", _W1, 7, None),
        # mixed NULL + real user in the delta half
        ("a", _W2, 50, None),
        ("a", _W2, 60, 64),
    ]
    df = _tagged(spark, rows)
    base = df.filter(F.col("week") == F.lit(_W1))
    delta = df.filter(F.col("week") != F.lit(_W1))

    merged = ivm_merge(
        [ivm_scalar_state(base), ivm_scalar_state(delta)],
        [ivm_bitmap_state(base), ivm_bitmap_state(delta)],
    ).collect()
    expected = _recompute(df).collect()
    assert [r.asDict() for r in merged] == [r.asDict() for r in expected]
    by_key = {(r["event_type"], str(r["week"])): r for r in merged}
    assert by_key[("a", str(_W1))]["n_users"] == 3
    assert by_key[("b", str(_W1))]["n_users"] == 0
    assert by_key[("a", str(_W2))]["n_users"] == 1


def test_ivm_merge_boundary_week_user_counts_once(spark):
    # the classic IVM distinct bug: same user active in both halves of
    # one week must count once after the bit_or merge
    rows = [("a", _W1, 1, 7), ("a", _W1, 2, 7)]
    df = _tagged(spark, rows)
    base = df.limit(1)
    delta = df.subtract(base)
    merged = ivm_merge(
        [ivm_scalar_state(base), ivm_scalar_state(delta)],
        [ivm_bitmap_state(base), ivm_bitmap_state(delta)],
    ).collect()
    assert len(merged) == 1 and merged[0]["n_users"] == 1
    assert merged[0]["n_rows"] == 2
