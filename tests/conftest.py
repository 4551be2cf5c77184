from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def pytest_collection_modifyitems(config, items):
    """Schedule wall-clock throughput-floor tests FIRST (r11 VERDICT item
    7): their msg/s floors sit inside the box's noise band once the rest
    of the suite has heated the machine (r10 flaked the fan-in floor,
    r11 the replay floor, both passing standalone). Running them before
    the ~40-minute sweep removes the suite's own residual load from the
    measurement; the in-test load-aware skip covers externally-busy
    boxes."""
    front = [i for i in items if i.get_closest_marker("throughput_floor")]
    if front:
        rest = [i for i in items if not i.get_closest_marker("throughput_floor")]
        items[:] = front + rest


@pytest.fixture(scope="session")
def spark():
    from transitdata_monitor_data_collector_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return SF_DIR_ORACLE
