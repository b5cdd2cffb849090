"""The driver contract (__spark_entry__.py) itself: loadable the way
the driver loads it, stable entry schema, oracle coverage accounted."""

import importlib.util
import os

# iterative / sketch-valued — documented in their modules
KNOWN_ROWS_ONLY = {"q_ann_kmeans_assign", "q_approx_distinct", "q_approx_quantiles"}


def _load_entry():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contract_shape():
    mod = _load_entry()
    q, o = mod.queries(), mod.oracle_sql()
    assert len(q) >= 51
    assert set(o) <= set(q), "oracle for undeclared query"
    assert set(q) - set(o) == KNOWN_ROWS_ONLY, (
        "every query needs an oracle unless explicitly rows-only"
    )
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_entry_runs_and_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.columns
    assert df.count() > 0
