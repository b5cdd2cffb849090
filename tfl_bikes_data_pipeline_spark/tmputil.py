"""Temp-directory hygiene shared by every query that materializes a
fixture copy (CSV/ORC/JSON roundtrips, streaming landing zones, XLSX/XML
edge writers): a plain ``tempfile.mkdtemp`` leaks one full table copy
per invocation for the machine's lifetime, which a long
bench/correctness session turns into unbounded /tmp growth."""

from __future__ import annotations

import atexit
import shutil
import tempfile


def sweep_tmpdir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit (not earlier — the
    DataFrames handed back to callers stay lazily bound to the files)."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
