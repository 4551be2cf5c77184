"""The driver gates the first 50 registry entries per round; the rotation
must therefore be computed so no query starves (round-3 VERDICT's top
risk): RE_GATE and never-gated queries lead, and a new CORRECTNESS file
rotates the window with zero manual edits.
"""

from __future__ import annotations

import glob
import json
import os

from transitdata_monitor_data_collector_spark.plans import (
    RE_GATE,
    gate_order,
    load_all,
)

REGISTRY = load_all()
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gated() -> set[str]:
    seen: set[str] = set()
    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        seen.update(json.load(open(p)).keys())
    return seen


def test_rotation_is_a_permutation_of_the_registry():
    order = gate_order(REGISTRY)
    assert sorted(order) == sorted(REGISTRY)


def test_regates_and_never_gated_lead_the_window():
    order = gate_order(REGISTRY)
    gated = _gated()
    window = order[:50]
    for n in RE_GATE:
        assert n in window, f"re-gate {n} fell outside the 50-row window"
    # every window slot is spent on a re-gate or a never-gated query as
    # long as enough of either exist
    n_useful = len(RE_GATE) + sum(
        1 for n in REGISTRY if n not in gated and n not in RE_GATE
    )
    for n in window[: min(50, n_useful)]:
        assert n in RE_GATE or n not in gated, (
            f"window slot wasted on already-green {n}"
        )


def test_new_queries_auto_queue_before_already_green_ones():
    gated = _gated()
    fake = list(REGISTRY) + ["brand_new_query_xyz"]
    order = gate_order(fake)
    pos_new = order.index("brand_new_query_xyz")
    first_green = min(
        (order.index(n) for n in order if n in gated and n not in RE_GATE),
        default=len(order),
    )
    assert pos_new < first_green


def test_regate_names_exist_in_registry():
    for n in RE_GATE:
        assert n in REGISTRY, f"RE_GATE entry {n} is not a registered query"


def test_already_green_tail_is_stalest_first():
    """Once re-gates and never-gated queries are exhausted, window slots
    re-certify the OLDEST driver rows first (r8 VERDICT item 1): the
    engine under an r1-vintage green row has been rewritten far more
    than under an r7 one."""
    from transitdata_monitor_data_collector_spark.plans import _gated_rounds

    rounds = _gated_rounds()
    order = gate_order(REGISTRY)
    tail = [n for n in order if n in rounds and n not in RE_GATE]
    ages = [rounds[n] for n in tail]
    assert ages == sorted(ages), (
        "already-gated queries not in ascending newest-row-round order"
    )
