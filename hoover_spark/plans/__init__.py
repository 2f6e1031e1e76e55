"""Iteration driving, checkpointing, lineage/metrics (SURVEY.md §4 O2/O5)."""
