"""Query registry — the engine's declared operator surface.

Every operator from SURVEY.md §2 that is implemented gets a named entry
here pairing (a) a Spark DataFrame builder with (b) an equivalent ANSI-SQL
string the DuckDB oracle can run on the same parquet tables. The driver's
t2 correctness gate iterates this registry (via ``__spark_entry__``).

Conventions (driver contract):
- every computed column is aliased identically in Spark and oracle SQL;
- double-valued aggregates are rounded to a fixed number of decimals on
  BOTH sides (float sums are order-dependent; rounding pins the value);
- DuckDB integer sums are CAST to BIGINT (DuckDB widens to HUGEINT);
- deterministic total order before any LIMIT / top-k.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One declared query/operator.

    ``oracle`` is None for genuinely non-SQL-expressible operators
    (custom stateful streaming, LSH internals) — the driver then records
    a weaker rows-only check.
    """

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY)."""
    from transitdata_monitor_data_collector_spark.plans import (  # noqa: F401
        llm_data,
        monitoring,
        relational,
        streaming_queries,
    )

    return REGISTRY


_NANO_COLS_CACHE: dict[str, list[str]] = {}


def _nano_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's reader rejects
    those outright, so they're read as long and truncated to micros
    (matching DuckDB's ns -> us truncation)."""
    if path not in _NANO_COLS_CACHE:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        _NANO_COLS_CACHE[path] = [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _NANO_COLS_CACHE[path]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_ts_cols(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df
