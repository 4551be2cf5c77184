"""Property-based tests (hypothesis) per SURVEY §5: Azure value shaping vs
an exact Python model, ISO-duration parsing vs a reference model, and
protobuf wire-parser robustness/round-trips."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from transitdata_monitor_data_collector_spark.config import (
    ConfigError,
    parse_iso_duration,
)
from transitdata_monitor_data_collector_spark.sources.gtfsrt import (
    FeedParseError,
    encode_feed_message,
    parse_feed_summary,
)

# ---------------------------------------------------------------------------
# Azure value shaping: round(2) -> abs -> (>10 -> round(0)); HALF_UP pinned
# (reference Python round is banker's — deviation documented in
# sinks/azure.py; the engine-side model uses HALF_UP on both sides).
# ---------------------------------------------------------------------------


def _shaped_model(x: float) -> float:
    d = Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    d = abs(d)
    if d > 10:
        d = d.quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    return float(d)


@pytest.fixture(scope="module")
def shaping_batch_check(spark):
    from pyspark.sql import functions as F

    from transitdata_monitor_data_collector_spark.sinks.azure import (
        shaped_metric_value,
    )

    def check(values: list[float]) -> None:
        df = spark.createDataFrame([(v,) for v in values], "v double")
        got = [
            r["s"]
            for r in df.select(
                shaped_metric_value(F.col("v")).alias("s")
            ).collect()
        ]
        expected = [_shaped_model(v) for v in values]
        assert got == pytest.approx(expected)

    return check


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ).map(lambda v: round(v, 4)),
        min_size=1,
        max_size=8,
    )
)
def test_shaped_value_matches_model(shaping_batch_check, values):
    shaping_batch_check(values)


# ---------------------------------------------------------------------------
# ISO-8601 duration parsing
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    days=st.integers(min_value=0, max_value=400),
    hours=st.integers(min_value=0, max_value=48),
    minutes=st.integers(min_value=0, max_value=120),
    seconds=st.integers(min_value=0, max_value=600),
)
def test_duration_parse_composed(days, hours, minutes, seconds):
    text = "P"
    if days:
        text += f"{days}D"
    time_part = ""
    if hours:
        time_part += f"{hours}H"
    if minutes:
        time_part += f"{minutes}M"
    if seconds:
        time_part += f"{seconds}S"
    if time_part:
        text += "T" + time_part
    if text == "P":
        with pytest.raises(ConfigError):
            parse_iso_duration(text)
        return
    assert parse_iso_duration(text) == (
        days * 86400 + hours * 3600 + minutes * 60 + seconds
    )


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20))
def test_duration_parse_never_crashes(text):
    try:
        v = parse_iso_duration(text)
        assert isinstance(v, float)
    except ConfigError:
        pass  # rejection is the only allowed failure mode


# ---------------------------------------------------------------------------
# Protobuf wire parser
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    version=st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=12,
    ),
    timestamp=st.integers(min_value=0, max_value=2**63 - 1),
    entities=st.lists(st.text(max_size=8), max_size=10),
)
def test_feed_round_trip(version, timestamp, entities):
    body = encode_feed_message(version, timestamp, entities)
    s = parse_feed_summary(body)
    assert s.gtfs_realtime_version == version
    assert s.timestamp == timestamp
    assert s.entity_count == len(entities)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_feed_parser_never_hangs_or_crashes(data):
    try:
        s = parse_feed_summary(data)
        assert s.entity_count >= 0
    except FeedParseError:
        pass  # structured rejection is the only allowed failure mode


# ---------------------------------------------------------------------------
# CUSUM prefix-sum identity: the window formulation used by
# events_cusum_changepoint must equal the sequential recursion
# C_i = max(0, C_{i-1} + d_i) for every deviation sequence.
from hypothesis import given as _given
from hypothesis import strategies as _st


@_given(_st.lists(_st.integers(min_value=-1000, max_value=1000), max_size=60))
def test_cusum_prefix_sum_identity(devs):
    c = 0
    recursive = []
    for d in devs:
        c = max(0, c + d)
        recursive.append(c)
    s = 0
    prefix = []
    for d in devs:
        s += d
        prefix.append(s)
    windowed = [
        prefix[i] - min(0, min(prefix[: i + 1])) for i in range(len(devs))
    ]
    assert windowed == recursive


@_given(
    _st.lists(
        _st.floats(min_value=0.0, max_value=600.0, allow_nan=False),
        min_size=1,
        max_size=200,
    )
)
def test_ewma_truncated_kernel_bound(xs):
    """The 32-lag truncated kernel used by timeseries_ewma must stay
    within the residual-mass bound of the true sequential recurrence:
    after renormalization the truncation error is at most
    (1-a)^K / (1 - (1-a)^K) of the value range."""
    a, K = 0.2, 32
    # sequential recurrence, seeded on the first sample
    e = xs[0]
    for x in xs[1:]:
        e = a * x + (1 - a) * e
    # truncated renormalized kernel at the last position
    w = [a * (1 - a) ** k for k in range(K)]
    tail = list(reversed(xs[-K:]))
    num = sum(wk * x for wk, x in zip(w, tail))
    den = sum(w[: len(tail)])
    kernel = num / den
    resid = (1 - a) ** min(K, len(xs))
    bound = resid / (1 - resid) * 600.0 + 1e-6
    assert abs(kernel - e) <= bound
