"""PySpark-native analytics engine with the query & data-processing
capabilities of HSLdevcom/transitdata-monitor-data-collector.

Brand-new Spark-first implementation (DataFrame / Spark SQL / Structured
Streaming) — NOT a port of the reference's Python/Java collector code.
The reference defines WHAT is computed (see /root/repo/SURVEY.md); this
package expresses those semantics as declarative Spark plans so Catalyst/
Tungsten/AQE pick the physical strategy.

Layout
------
- ``session``    SparkSession factory (UTC, AQE, Arrow).
- ``config``     typed config mirroring the reference's AppConfig validation.
- ``schemas``    explicit StructTypes for every source (FIXTURES.md).
- ``functions``  scalar/column functions incl. the MQTT topic-filter matcher.
- ``operators``  relational + monitoring operators (rates, summaries, dedup,
                 similarity, rollups) as DataFrame → DataFrame combinators.
- ``sources``    batch & streaming sources (file replay, MQTT, GTFS-RT poll,
                 Pulsar admin REST).
- ``sinks``      Azure-Monitor-format foreachBatch sink, Prometheus text view.
- ``streaming``  end-to-end streaming jobs (windowed rate, cumulative counter,
                 gauge).
- ``plans``      the query registry powering ``__spark_entry__`` (each query
                 paired with a DuckDB oracle SQL string).
"""

__version__ = "0.1.0"
