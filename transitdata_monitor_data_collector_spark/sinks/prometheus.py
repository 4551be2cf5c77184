"""Prometheus text exposition rendering.

The reference serves its aggregate state as Prometheus text on
``GET /metrics`` (``…/web/MetricsEndpoint.java:17-24``, Micrometer's
PrometheusMeterRegistry doing the rendering). Here the "registry" is the
latest aggregate DataFrame of each streaming job; rendering is a driver-side
formatter over those small results (aggregate cardinality = label-set
registry, tiny by construction).

Micrometer naming conventions reproduced:
- counter ``x_total`` rendered as ``x_total{tags} v``;
- gauge rendered as-is;
- DistributionSummary ``s`` rendered as ``s_count``, ``s_sum`` and a
  ``s_max`` gauge (GtfsRtMetricsRegistryTest.java:204-224 semantics).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame

__all__ = ["render_counter", "render_gauge", "render_summary", "render_page"]


def _fmt_labels(row, label_cols: Sequence[str]) -> str:
    if not label_cols:
        return ""
    inner = ",".join(
        f'{c}="{_escape(str(row[c]))}"' for c in label_cols
    )
    return "{" + inner + "}"


def _escape(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt_value(v) -> str:
    if v is None:
        return "NaN"
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return f"{f:.1f}"
    return repr(f)


def render_counter(
    name: str,
    df: DataFrame,
    value_col: str,
    label_cols: Sequence[str],
    help_text: str = "",
) -> str:
    lines = [f"# HELP {name} {help_text}".rstrip(), f"# TYPE {name} counter"]
    for row in df.collect():
        lines.append(
            f"{name}{_fmt_labels(row, label_cols)} {_fmt_value(row[value_col])}"
        )
    return "\n".join(lines) + "\n"


def render_gauge(
    name: str,
    df: DataFrame,
    value_col: str,
    label_cols: Sequence[str],
    help_text: str = "",
) -> str:
    lines = [f"# HELP {name} {help_text}".rstrip(), f"# TYPE {name} gauge"]
    for row in df.collect():
        lines.append(
            f"{name}{_fmt_labels(row, label_cols)} {_fmt_value(row[value_col])}"
        )
    return "\n".join(lines) + "\n"


def render_summary(
    name: str,
    df: DataFrame,
    count_col: str,
    sum_col: str,
    max_col: str,
    label_cols: Sequence[str],
    help_text: str = "",
) -> str:
    """Micrometer DistributionSummary → _count/_sum + _max gauge."""
    rows = df.collect()
    lines = [f"# HELP {name} {help_text}".rstrip(), f"# TYPE {name} summary"]
    for row in rows:
        labels = _fmt_labels(row, label_cols)
        lines.append(f"{name}_count{labels} {_fmt_value(row[count_col])}")
        lines.append(f"{name}_sum{labels} {_fmt_value(row[sum_col])}")
    lines.append(f"# HELP {name}_max ")
    lines.append(f"# TYPE {name}_max gauge")
    for row in rows:
        labels = _fmt_labels(row, label_cols)
        lines.append(f"{name}_max{labels} {_fmt_value(row[max_col])}")
    return "\n".join(lines) + "\n"


def render_page(sections: Mapping[str, str]) -> str:
    """Concatenate rendered metric families into one exposition page."""
    return "".join(sections[k] for k in sections)
