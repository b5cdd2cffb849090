"""Placeholder — filled in by the extension-operator milestone."""

QUERIES: dict = {}
ORACLES: dict = {}
BENCH: list = []
