"""Unit coverage for the k-stress streaming-replay tool's pure helpers
(tools/stress_streaming.py) — the certification itself runs out-of-suite
at k=20 (docs/STRESS.md r10), but the metric extraction and the
bounded-dedup invariant logic are plain functions the suite can pin."""

from __future__ import annotations

from tools.stress_streaming import _progress_metrics


def _prog(rows: int, ms: int, state: int) -> dict:
    return {
        "numInputRows": rows,
        "durationMs": {"triggerExecution": ms},
        "stateOperators": [{"numRowsTotal": state}],
    }


def test_progress_metrics_shapes():
    m = _progress_metrics(
        [
            _prog(100, 500, 10),
            _prog(100, 700, 20),
            _prog(0, 50, 20),  # trailing empty batch: excluded from durations
        ]
    )
    assert m["n_batches"] == 3
    assert m["n_batches_with_rows"] == 2
    assert m["input_rows"] == 200
    assert m["peak_state_rows"] == 20
    assert m["batch_ms"]["max"] == 700
    assert m["batch_ms"]["mean"] == 600.0
    # p50/p95 index into the sorted fed-batch durations
    assert m["batch_ms"]["p50"] in (500, 700)
    assert m["batch_ms"]["p95"] == 700


def test_progress_metrics_empty():
    m = _progress_metrics([])
    assert m["n_batches"] == 0
    assert m["peak_state_rows"] == 0
    assert m["batch_ms"]["mean"] == 0


def test_dedup_bounds_check_logic():
    import duckdb

    from tools.stress_streaming import _dedup_bounds_check

    con = duckdb.connect()
    # a toy events table: 2 users -> 2 brokers via the BROKER_SQL mapping
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(0, 'a'), (0, 'a'), (0, 'b'), (1, 'a'), (1, 'a')"
        ") t(user_id, event_type)"
    )
    oracle = """
    SELECT CASE WHEN user_id % 3 = 0 THEN 'tcp://mqtt.hsl.fi:1883'
                ELSE 'wss://mqtt-dev.hsl.fi:443' END AS broker,
           count(DISTINCT event_type) AS n
    FROM events GROUP BY 1 ORDER BY 1
    """
    # r10 ADVICE: rows arrive as name->value dicts and the key/count
    # columns are selected BY NAME from the oracle's schema — include an
    # extra column that sorts BEFORE both to prove position independence
    def rows(tcp, wss):
        return [
            {"_extra": "x", "broker": "tcp://mqtt.hsl.fi:1883", "n": tcp},
            {"_extra": "y", "broker": "wss://mqtt-dev.hsl.fi:443", "n": wss},
        ]

    # distinct per broker: tcp -> 2 ('a','b'), wss -> 1; raw: 3 and 2
    assert _dedup_bounds_check(con, rows(2, 2), oracle) is None
    assert "outside" in _dedup_bounds_check(con, rows(1, 1), oracle)
    assert "outside" in _dedup_bounds_check(con, rows(4, 1), oracle)
    missing = [{"broker": "tcp://mqtt.hsl.fi:1883", "n": 2}]
    assert "keys differ" in _dedup_bounds_check(con, missing, oracle)
    lacking = [{"_extra": "x", "n": 2}]
    assert "lacks oracle columns" in _dedup_bounds_check(
        con, lacking, oracle
    )


def test_disorder_delivery_order():
    """The adjacent-pair-swap delivery order generator: every slice
    arrives exactly one position early or late, covering odd tails."""
    from tools.stress_streaming import build_disorder_dir  # noqa: F401

    # reproduce the generator inline (it is 4 lines inside the builder)
    def delivery(n):
        out = []
        for i in range(1, n + 1, 2):
            out.extend([i + 1, i] if i + 1 <= n else [i])
        return out

    assert delivery(8) == [2, 1, 4, 3, 6, 5, 8, 7]
    assert delivery(16) == [2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11,
                            14, 13, 16, 15]
    assert delivery(5) == [2, 1, 4, 3, 5]
    assert sorted(delivery(16)) == list(range(1, 17))
