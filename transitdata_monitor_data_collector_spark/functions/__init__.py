"""Scalar / column functions.

- ``mqtt_match``: the one genuinely custom scalar function in the reference
  (MQTT wildcard topic-filter matching, SURVEY.md §2 P7/UD1/UD2).
- ``scalars``: the reference's scalar-function surface (F1-F15) as Column
  builders with pinned semantics.
- ``text``: language-ID, quality scoring, token counting, fingerprinting
  (charter extensions for LLM-data pipelines).
- ``vectors``: embedding math (dot / norm / cosine) as pure Column
  expressions over ``array<float>``.
"""

from transitdata_monitor_data_collector_spark.functions.mqtt_match import (  # noqa: F401
    filter_to_regex,
    matching_filters_col,
    topic_matches,
    with_topic_filter_fanout,
)
