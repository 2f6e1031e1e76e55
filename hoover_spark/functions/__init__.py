"""Shared column expressions: ids, skew salting, text features."""
