"""Sinks: Azure Monitor custom-metric POST (foreachBatch) and Prometheus
text exposition rendering."""
