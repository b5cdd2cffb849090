"""Placeholder — filled in by the streaming milestone."""

QUERIES: dict = {}
ORACLES: dict = {}
