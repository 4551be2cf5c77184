"""Liveness / readiness surface for streaming jobs.

Re-expresses the reference's web endpoints
(``…/web/LivenessEndpoint.java:12-17`` — static 200 OK;
``…/web/HealthEndpoint.java:17-43`` — 503 until the app flips a ready
flag after startup, 200 afterwards; wired in ``Main.java:40-55``) on top
of Spark's ``StreamingQuery`` status: a query is *live* if its thread is
active, *ready* once it has made progress (the analog of the post-startup
ready flip).

The HTTP layer stays trivial by design (the reference's is, too): any
web framework can call :func:`liveness` / :func:`readiness` and map the
booleans to 200/503.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql.streaming import StreamingQuery

__all__ = ["HealthStatus", "liveness", "readiness", "status_report"]


@dataclass(frozen=True)
class HealthStatus:
    ok: bool
    http_status: int
    detail: str


def liveness() -> HealthStatus:
    """Static 200 OK (LivenessEndpoint.java:12-17: always alive while the
    process serves)."""
    return HealthStatus(ok=True, http_status=200, detail="OK")


def readiness(queries: list[StreamingQuery]) -> HealthStatus:
    """503 until every registered query is active AND has committed at
    least one batch; 200 afterwards (HealthEndpoint.java:17-43 ready-flag
    semantics — the flag flips after startup completes)."""
    if not queries:
        return HealthStatus(False, 503, "no queries registered")
    for q in queries:
        if not q.isActive:
            return HealthStatus(False, 503, f"query {q.name or q.id} not active")
        if q.lastProgress is None:
            return HealthStatus(
                False, 503, f"query {q.name or q.id} has no progress yet"
            )
    return HealthStatus(True, 200, "OK")


def status_report(queries: list[StreamingQuery]) -> list[dict[str, Any]]:
    """Operational snapshot per query (the /metrics-adjacent detail view):
    id, name, active flag, and the latest progress' input/processed rates."""
    out: list[dict[str, Any]] = []
    for q in queries:
        p = q.lastProgress or {}
        out.append(
            {
                "id": str(q.id),
                "name": q.name,
                "is_active": q.isActive,
                "batch_id": p.get("batchId"),
                "num_input_rows": p.get("numInputRows"),
                "input_rows_per_second": p.get("inputRowsPerSecond"),
                "processed_rows_per_second": p.get("processedRowsPerSecond"),
                "status_message": q.status.get("message") if q.status else None,
            }
        )
    return out
