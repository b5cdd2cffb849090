"""Central registry of declared queries and their DuckDB oracles.

``__spark_entry__.py`` (the driver contract) and ``bench.py`` both read
from here. Each entry: name → callable(spark, sf_dir) -> DataFrame, and
(where SQL-expressible) name → ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import ensure_runtime_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Error-bound oracles for sketch-valued queries whose outputs are
#: approximate BY DESIGN (HLL, Greenwald-Khanna) and so can never
#: hash-match an exact engine. The SQL returns, per key row, a
#: ``<col>_lo`` / ``<col>_hi`` pair for every approximate output column
#: (non-suffixed columns are exact-match join keys); the differential
#: gate asserts key-set equality and lo <= value <= hi per cell. A
#: query appears in exactly one of ORACLES / BOUND_ORACLES.
BOUND_ORACLES: dict[str, str] = {}

#: The bench set. Module BENCH lists control the ORDER of their
#: curated head entries; after registration the set is topped up to
#: EVERY registered query (see the end of this module) — the driver
#: re-picks its pinned correctness subset each round, and a
#: pinned-but-unbenched query is a standing audit finding (a query's
#: wall-time must never be invisible in BENCH_DETAIL.md).
BENCH_QUERIES: list[str] = []


def _self_sufficient(fn: QueryFn) -> QueryFn:
    """Wrap a query so it works on ANY live session, including the plain
    (no builder confs) SparkSession the driver's correctness harness builds.
    Applies the runtime SQL confs (nanos-parquet read, UTC TZ, AQE, ...)
    before the query declares its plan."""

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_runtime_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


def _register(
    queries: dict[str, QueryFn],
    oracles: dict[str, str],
    bench: list[str],
    bound_oracles: dict[str, str] | None = None,
) -> None:
    QUERIES.update({name: _self_sufficient(fn) for name, fn in queries.items()})
    ORACLES.update(oracles)
    BOUND_ORACLES.update(bound_oracles or {})
    BENCH_QUERIES.extend(bench)


def _load_all() -> None:
    from .plans import queries as analyst

    _register(analyst.QUERIES, analyst.ORACLES, list(analyst.QUERIES))

    from .plans import pipelines, sql_surface, sql_twins, tpch_suite

    _register(tpch_suite.QUERIES, tpch_suite.ORACLES, list(tpch_suite.QUERIES))
    _register(pipelines.QUERIES, pipelines.ORACLES, pipelines.BENCH)
    _register(sql_surface.QUERIES, sql_surface.ORACLES, list(sql_surface.QUERIES))
    _register(sql_twins.QUERIES, sql_twins.ORACLES, list(sql_twins.QUERIES))

    from .operators import (
        asof,
        dedup,
        fuzzy,
        graph,
        layout,
        merge,
        multimodal,
        profile,
        retrieval,
        scd,
        similarity,
        text,
        timeseries,
        training,
    )

    for mod in (dedup, similarity, text, multimodal, profile, retrieval, asof, timeseries, merge, scd, fuzzy, training, graph, layout):
        _register(
            mod.QUERIES,
            mod.ORACLES,
            getattr(mod, "BENCH", list(mod.QUERIES)),
            getattr(mod, "BOUND_ORACLES", None),
        )

    from .sources import raw, spatial, xlsx, xml_feed

    for mod in (raw, spatial, xlsx, xml_feed):
        _register(mod.QUERIES, mod.ORACLES, getattr(mod, "BENCH", list(mod.QUERIES)))

    from .streaming import jobs as streaming_jobs
    from .functions import skew

    _register(skew.QUERIES, skew.ORACLES, skew.BENCH)

    from .streaming import stateful as streaming_stateful

    _register(streaming_jobs.QUERIES, streaming_jobs.ORACLES, streaming_jobs.BENCH)
    _register(
        streaming_stateful.QUERIES, streaming_stateful.ORACLES, ["q_session_window"]
    )


_load_all()

# no silent caps: every registered query gets a bench number (curated
# module BENCH entries keep their order at the head; the remainder
# appends in registration order).
BENCH_QUERIES[:] = list(dict.fromkeys([*BENCH_QUERIES, *QUERIES]))


#: Registry HEAD — the driver pins the FIRST ~50 entries of
#: ``queries()`` each round. The r11 rotation CLOSED the
#: never-driver-checked backlog, so the head pins by STALENESS
#: (verdict r11 task 2): new-this-round queries first (introduction-
#: round pin — the invariant that nothing hash-oracled ships
#: driver-unchecked; r13 introduces none), then every remaining query
#: ordered by the round of its most recent driver-green CORRECTNESS
#: row, oldest first. This tuple is the VERBATIM output of
#: ``python tools/gen_head.py`` over the committed
#: CORRECTNESS_r01–r13 artifacts (tests/test_registry_contract.py
#: asserts the match, so a stale paste fails CI rather than silently
#: freezing coverage — verdict r12 task 2). r14 head: the 10
#: retrieval/streaming queries whose last green row is r9 (the tail
#: the r13 50-slot pin didn't reach), then the r10 profile/timeseries/
#: merge/training/graph cohort. Every name here must carry a full hash
#: oracle (the two bound-oracled q_approx_* sketches are excluded by
#: construction; their error contracts ride the hash-oracled
#: q_approx_*_gate twins, driver-green r12).
REGISTRY_HEAD: tuple[str, ...] = (
    # 1) last driver-green r9: the retrieval/eval/streaming tail that
    #    overflowed the r13 50-slot pin
    "q_bm25_topk", "q_hybrid_rrf", "q_rbo_eval",
    "q_decontaminate", "q_split_leakage_safe", "q_dsir_weights",
    "q_stream_tumbling", "q_stream_dedup",
    "q_session_window", "q_stream_stateful_counts",
    # 2) last driver-green r10: profile/quality, asof/range/sampling,
    #    timeseries, merge/SCD, fuzzy/entity, training mix, graph —
    #    registration order within the round (gen_head preserves
    #    registry order for ties)
    "q_cdc_chunks",
    "q_multimodal_meta", "q_multimodal_framesample",
    "q_multimodal_phash_pairs", "q_multimodal_dedup_canonical",
    "q_profile_nulls", "q_minmax_bounds", "q_stats_moments",
    "q_winsorized_means", "q_drift_psi", "q_bloom_filter_probe",
    "q_cms_counts", "q_dq_audit", "q_table_stats", "q_mad_outliers",
    "q_quality_model", "q_source_overlap",
    "q_asof_join", "q_range_join", "q_sample_hash",
    "q_sample_stratified", "q_gap_fill", "q_histogram",
    "q_ts_similarity", "q_ewma", "q_anomaly_zscore",
    "q_rolling_actives",
    "q_merge_upsert", "q_incremental_agg", "q_snapshot_diff",
    "q_latest_snapshot", "q_scd2_history", "q_scd2_point_lookup",
    "q_fuzzy_pairs", "q_entity_resolution",
    "q_split_assign", "q_mixture_sample", "q_mixture_plan",
    "q_pack_sequences", "q_sample_weighted",
)


def _rotate_head() -> None:
    missing = [n for n in REGISTRY_HEAD if n not in QUERIES]
    assert not missing, f"REGISTRY_HEAD names not registered: {missing}"
    unoracled = [n for n in REGISTRY_HEAD if n not in ORACLES]
    assert not unoracled, f"REGISTRY_HEAD names without hash oracles: {unoracled}"
    head = set(REGISTRY_HEAD)
    reordered = {n: QUERIES[n] for n in REGISTRY_HEAD}
    reordered.update({n: fn for n, fn in QUERIES.items() if n not in head})
    QUERIES.clear()
    QUERIES.update(reordered)


_rotate_head()


#: Fallback driver-pinned set (as observed in CORRECTNESS_r04.json).
#: Documentation only — the authoritative set is derived at import time
#: from the latest CORRECTNESS_r{N}.json artifact (the driver re-picks
#: its ~50-query subset each round), so a driver subset change produces
#: a doc refresh, not a red test suite. Everything outside the pinned
#: set is verified by the repo's own identical DuckDB differential gate
#: (tests/test_oracle_differential.py) — same oracle SQL, same compare.
_DRIVER_PINNED_R4: frozenset[str] = frozenset({
    "p_dim_time", "p_fact_build", "p_incremental_append", "p_weather_align",
    "p_weather_ids", "q_ann_brute_arrow", "q_ann_brute_topk",
    "q_bucket_by_location", "q_case_bucket_count", "q_cohort_retention",
    "q_count_distinct", "q_cube", "q_dedup_clusters", "q_dedup_embedding",
    "q_dedup_embedding_clusters", "q_dedup_exact", "q_dedup_incremental",
    "q_dedup_incremental_lsh", "q_dedup_minhash_lsh", "q_dedup_ngram_jaccard",
    "q_dedup_segments", "q_dedup_simhash", "q_dedup_simhash_pairs",
    "q_filter_hour_topk", "q_full_outer", "q_funnel", "q_group_by_hour",
    "q_grouping_sets", "q_join_cte_inner", "q_json_props", "q_k_anonymity",
    "q_local_supplier_volume", "q_moving_avg", "q_ntile_window", "q_pivot",
    "q_pricing_summary", "q_quantiles", "q_rank_lag", "q_rollup",
    "q_running_total", "q_scalar_subquery", "q_semi_anti", "q_set_ops",
    "q_shipping_priority", "q_sql_view_topk", "q_star_view",
    "q_time_to_convert", "q_topk_count", "q_topk_join_count", "q_unpivot",
})


def _driver_pinned_from_artifacts() -> tuple[frozenset[str], str | None]:
    """(pinned set, artifact filename) from the newest
    CORRECTNESS_r{N}.json, or (r4 fallback, None) without artifacts."""
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    # fullmatch-filter before sorting: a stray CORRECTNESS_rerun.json
    # would match the glob but not the round pattern, and must not
    # crash package import.
    numbered = [
        (int(m.group(1)), p)
        for p in repo.glob("CORRECTNESS_r*.json")
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name))
    ]
    arts = [p for _, p in sorted(numbered)]
    for art in reversed(arts):
        try:
            names = frozenset(json.loads(art.read_text()))
        except (OSError, ValueError):
            continue
        if names:
            return names, art.name
    return _DRIVER_PINNED_R4, None


DRIVER_PINNED, DRIVER_PINNED_SOURCE = _driver_pinned_from_artifacts()
