"""Structured Streaming jobs mirroring the reference's stateful pipelines
(SURVEY.md §2.7, §3.1-3.3): windowed rate, cumulative counter, gauge,
dedup-within-watermark. The tested path is deterministic file replay with
``trigger(availableNow=True)`` — the reference likewise never tests live
brokers (SURVEY.md §5)."""
