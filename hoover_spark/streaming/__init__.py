"""Structured Streaming micro-batch edge ingestion (SURVEY.md §2.8)."""
