"""Perf / data tools (scripts; not part of the package API)."""
