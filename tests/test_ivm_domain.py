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


def test_shared_bitmap_helper_full_domain(spark):
    """r10 ADVICE: the shiftright/pmod word-slot arithmetic is now ONE
    shared helper (functions/bitmap.py) used by all four bitmap
    consumers. Pin its contract over the hostile id domain — negatives,
    the 2^53 double-precision cliff, long extremes: word = floor(id/32)
    and bit = id mod 32 (non-negative), exactly, so no two distinct ids
    share a (word, bit) cell."""
    from transitdata_monitor_data_collector_spark.functions.bitmap import (
        bitmap_bit,
        bitmap_word,
    )

    ids = [
        0, 1, 31, 32, -1, -32, -33,
        2**53 - 1, 2**53, 2**53 + 1, 2**53 + 33,
        -(2**53) - 1, 2**62, -(2**62) - 7,
        2**63 - 1, -(2**63),
    ]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    got = {
        r["user_id"]: (r["w"], r["b"])
        for r in df.select(
            "user_id",
            bitmap_word("user_id").alias("w"),
            bitmap_bit("user_id").alias("b"),
        ).collect()
    }
    for i in ids:
        # Python // and % are floor-div / non-negative-mod on ints —
        # the exact semantics the helper must reproduce in the JVM.
        want_w, want_b = i // 32, 1 << (i % 32)
        assert got[i] == (want_w, want_b), (
            f"id {i}: got {got[i]}, want {(want_w, want_b)}"
        )
    # distinctness: every id owns its own (word, bit) cell
    assert len(set(got.values())) == len(ids)


def test_bitmap_queries_exact_on_hostile_ids(tmp_path, spark):
    """End-to-end: the batch bitmap query (agg_bitmap_distinct_users'
    plan shape) and the streaming twin's job both recover the EXACT
    distinct count over ids that break the naive (id/32).cast('long')
    arithmetic — negative ids and ids beyond 2^53."""
    from pyspark.sql import functions as F

    from transitdata_monitor_data_collector_spark.streaming.jobs import (
        bitmap_distinct_job,
    )

    ids = [-1, -32, -33, 31, 32, 2**53, 2**53 + 1, 2**53 + 32, -(2**53) - 1]
    ev = spark.createDataFrame(
        [("2024-05-01 00:00:00", i) for i in ids * 3],  # 3x duplicates
        "ts string, user_id long",
    ).select(F.col("ts").cast("timestamp"), "user_id")
    words = bitmap_distinct_job(ev)  # batch frames run the same plan
    n = (
        words.agg(F.sum(F.bit_count("mask")).cast("long").alias("n"))
        .collect()[0]["n"]
    )
    assert n == len(set(ids))
