"""Structured Streaming layer (beyond-parity extension, SURVEY.md §2.11)."""
