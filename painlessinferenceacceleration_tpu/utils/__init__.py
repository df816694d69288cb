"""Utilities: metrics, readers, benchmarking helpers."""
