"""Operational CLIs (weights bootstrap, verification)."""
