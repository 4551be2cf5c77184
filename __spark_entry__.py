"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (MQTT fan-out windowed rate) at
sf0.001; ``queries()``/``oracle_sql()`` expose the full operator registry
(transitdata_monitor_data_collector_spark/plans/) for the DuckDB oracle gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transitdata_monitor_data_collector_spark.plans import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["mqtt_fanout_window_rate"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ charter
    extensions). Each callable takes (spark, sf_dir) -> DataFrame."""
    return {name: q.build for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-expressible
    ops -> driver records a weaker rows-only check)."""
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
