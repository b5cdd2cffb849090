"""Model-based property tests (hypothesis) for the upsert/history
operators — the algebraic laws a table-maintenance layer must hold,
checked against tiny in-Python models on generated inputs.

Kept to few examples per property: each example runs real Spark jobs;
the value is the generated edge cases (empty batches, all-matched,
all-new, single-key runs), not volume.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tfl_bikes_data_pipeline_spark.operators.merge import merge_upsert
from tfl_bikes_data_pipeline_spark.operators.scd import scd2_collapse

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=6)
vals = st.integers(min_value=-5, max_value=5)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(k, float(v)) for k, v in pairs], "k INT, v DOUBLE"
    )


@given(
    base=st.dictionaries(keys, vals, max_size=6),
    upd=st.dictionaries(keys, vals, max_size=6),
)
@settings(**SETTINGS)
def test_merge_upsert_matches_dict_model(spark, base, upd):
    merged = merge_upsert(
        _rows(spark, base.items()), _rows(spark, upd.items()), ["k"]
    )
    got = {r["k"]: r["v"] for r in merged.collect()}
    want = {**{k: float(v) for k, v in base.items()},
            **{k: float(v) for k, v in upd.items()}}
    assert got == want


@given(
    base=st.dictionaries(keys, vals, max_size=5),
    u1=st.dictionaries(keys, vals, max_size=5),
    u2=st.dictionaries(keys, vals, max_size=5),
)
@settings(**SETTINGS)
def test_merge_upsert_sequential_batches_compose(spark, base, u1, u2):
    b = _rows(spark, base.items())
    step = merge_upsert(merge_upsert(b, _rows(spark, u1.items()), ["k"]),
                        _rows(spark, u2.items()), ["k"])
    got = {r["k"]: r["v"] for r in step.collect()}
    want = {**{k: float(v) for k, v in base.items()},
            **{k: float(v) for k, v in u1.items()},
            **{k: float(v) for k, v in u2.items()}}
    assert got == want


def _scd2_model(events):
    """events: list of (key, ts, attr) — returns the collapsed history
    {(key, run_index): (attr, valid_from, valid_to, n)}."""
    out = {}
    by_key = {}
    for k, ts, a in sorted(events, key=lambda e: (e[0], e[1])):
        by_key.setdefault(k, []).append((ts, a))
    for k, seq in by_key.items():
        runs = []
        for ts, a in seq:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, ts, 1])
        for i, (a, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            out[(k, i)] = (a, vf, vt, n)
    return out


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=50),  # ts
            st.sampled_from(["a", "b", "c"]),        # attr
        ),
        max_size=20,
        unique_by=lambda e: (e[0], e[1]),  # unique (key, ts): total order
    )
)
@settings(**SETTINGS)
def test_scd2_collapse_matches_run_model(spark, events):
    df = spark.createDataFrame(
        events or [(0, 0, "a")], "k INT, ts INT, attr STRING"
    )
    if not events:
        events = [(0, 0, "a")]
    got = scd2_collapse(df, "k", "attr", ["ts"]).collect()
    model = _scd2_model(events)
    assert len(got) == len(model)
    got_rows = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in got
    }
    want_rows = {
        (k, a, vf, vt, n) for (k, _i), (a, vf, vt, n) in model.items()
    }
    assert got_rows == want_rows


def test_exact_sums_partition_independent(spark, sf_dir):
    """The determinism claim behind every oracle: exact-decimal
    aggregates must be bit-identical under different shuffle layouts
    (3 partitions vs the session default 8 stands in for local[32]
    vs a 1000-executor cluster)."""
    from tfl_bikes_data_pipeline_spark.plans.queries import q_pricing_summary

    def run():
        return [tuple(r) for r in q_pricing_summary(spark, sf_dir).collect()]

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        baseline = run()
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert run() == baseline
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
