"""Structured Streaming ingest (SURVEY.md §2.9 — optional v2 surface)."""
