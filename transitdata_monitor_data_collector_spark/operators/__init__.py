"""Relational + monitoring + LLM-pipeline operators as DataFrame -> DataFrame
combinators. Each module documents its shuffle/partitioning posture for the
100 TB target."""
