"""Salting helpers: result-equivalence with unsalted formulations (salt
must never change answers) and hot-key spread."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.operators.skew import (
    salted_join,
    salted_two_phase_agg,
    with_salt,
)


def _events(spark, sf_dir):
    from transitdata_monitor_data_collector_spark.plans import table

    return table(spark, sf_dir, "events")


def test_salt_is_deterministic_and_bounded(spark, sf_dir):
    ev = _events(spark, sf_dir).limit(200)
    s1 = [r["_salt"] for r in with_salt(ev, 8).orderBy("event_id").collect()]
    s2 = [r["_salt"] for r in with_salt(ev, 8).orderBy("event_id").collect()]
    assert s1 == s2
    assert all(0 <= s < 8 for s in s1)
    assert len(set(s1)) > 1  # actually spreads


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    dim = spark.createDataFrame(
        [("click", 1.5), ("view", 2.0), ("purchase", 0.5), ("error", 9.9),
         ("signup", 1.0)],
        "event_type string, weight double",
    )
    plain = (
        ev.join(dim, "event_type")
        .select("event_id", "event_type", "weight")
        .orderBy("event_id")
        .collect()
    )
    salted = (
        salted_join(ev, dim, "event_type", n_salts=4)
        .select("event_id", "event_type", "weight")
        .orderBy("event_id")
        .collect()
    )
    assert salted == plain


def test_salted_two_phase_agg_counts(spark, sf_dir):
    ev = _events(spark, sf_dir)
    plain = {
        (r["event_type"]): (r["n"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    salted = {
        (r["event_type"]): (r["n"], r["total"])
        for r in salted_two_phase_agg(
            ev.select("event_type", "value"),
            keys=["event_type"],
            exprs={
                "n": {"partial": F.count("*"), "merge": F.sum},
                "total": {
                    "partial": F.sum("value"),
                    "merge": lambda c: F.round(F.sum(c), 4),
                },
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_distinct_merge(spark, sf_dir):
    ev = _events(spark, sf_dir)
    plain = {
        r["event_type"]: r["n_users"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    # distinct via salted collect_set -> flatten -> distinct -> size
    salted = {
        r["event_type"]: r["n_users"]
        for r in salted_two_phase_agg(
            ev.select("event_type", "user_id"),
            keys=["event_type"],
            exprs={
                "n_users": {
                    "partial": F.collect_set("user_id"),
                    "merge": lambda c: F.size(
                        F.array_distinct(F.flatten(F.collect_list(c)))
                    ),
                }
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_rejects_right_preserving_joins(spark):
    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "b")], "k long, w string")
    with pytest.raises(ValueError, match="left-preserving"):
        salted_join(left, right, "k", how="full_outer")
    with pytest.raises(ValueError, match="left-preserving"):
        salted_join(left, right, "k", how="right")
