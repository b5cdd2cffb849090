"""Semantic properties of the retrieval / model-inference operators
(beyond the oracle hash): ranking monotonicity, decision-band
partition, canonical-selection policy, overlap bounds — plus the
plan-shape pins that make each operator's 100 TB story checkable."""

import pyspark.sql.functions as F

from tfl_bikes_data_pipeline_spark.operators.retrieval import (
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    QMODEL_DROP,
    QMODEL_KEEP,
    bm25_topk,
    quality_model_scores,
    source_overlap,
)
from tfl_bikes_data_pipeline_spark.tables import load_table
from .test_plan_quality import _exchange_count, plan_of


def test_bm25_scores_positive_and_bounded(spark, sf_dir):
    """Every returned doc matched ≥1 query term (score > 0), and the
    result is exactly the top-k: no doc outside the result may out-score
    the k-th returned doc."""
    docs = load_table(spark, sf_dir, "documents")
    top = bm25_topk(docs).collect()
    assert 0 < len(top) <= BM25_TOP_K
    assert all(r.score > 0 for r in top)
    kth = top[-1].score
    # rerun unrestricted: count docs scoring strictly above the k-th
    allscores = bm25_topk(docs, k=10**6).collect()
    above = [r for r in allscores if r.score > kth]
    assert len(above) < BM25_TOP_K


def test_bm25_more_matches_scores_higher(spark):
    """A doc containing every query term must outrank an
    equal-length doc containing one — idf-weighted sum dominance."""
    t_all = " ".join(BM25_QUERY_TERMS) + " filler pad pad"
    t_one = f"{BM25_QUERY_TERMS[0]} filler pad pad pad pad"
    docs = spark.createDataFrame(
        [(1, t_all), (2, t_one), (3, "nothing here at all pad pad")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.score for r in bm25_topk(docs).collect()}
    assert 3 not in rows  # no query term → no score row
    assert rows[1] > rows[2]


def test_quality_model_bands_partition_scores(spark, sf_dir):
    """decision is a pure function of raw_score with the declared
    thresholds — bands must partition the score line exactly."""
    docs = load_table(spark, sf_dir, "documents")
    bad = quality_model_scores(docs).where(
        (
            (F.col("raw_score") >= QMODEL_KEEP) & (F.col("decision") != "keep")
        )
        | (
            (F.col("raw_score") < QMODEL_DROP) & (F.col("decision") != "drop")
        )
        | (
            (F.col("raw_score") >= QMODEL_DROP)
            & (F.col("raw_score") < QMODEL_KEEP)
            & (F.col("decision") != "review")
        )
    )
    assert bad.count() == 0


def test_quality_model_is_narrow(spark, sf_dir):
    """Model inference is a pure map: the ONLY Exchange allowed is the
    presentation sort's range partitioning — the plan property that
    makes the quality-filter pass a single corpus scan at 100 TB."""
    from tfl_bikes_data_pipeline_spark import registry

    plan = plan_of(registry.QUERIES["q_quality_model"](spark, sf_dir))
    n = _exchange_count(plan)
    assert n <= 1, f"quality-model plan shuffles {n}× (budget 1: the sort)"


def test_bm25_is_one_pass(spark, sf_dir):
    """BM25's 100 TB shape: per-row tf extraction (no Generate — the
    corpus vocabulary never materializes), ONE single-row scalar
    aggregate (the only Exchange) broadcast back, TakeOrderedAndProject
    for the top-k."""
    from tfl_bikes_data_pipeline_spark import registry

    plan = plan_of(registry.QUERIES["q_bm25_topk"](spark, sf_dir))
    assert "Generate" not in plan, "BM25 must not explode the corpus"
    n = _exchange_count(plan)
    assert n <= 1, f"BM25 shuffles {n}× (budget 1: the scalar aggregate)"
    assert "TakeOrderedAndProject" in plan


def test_canonical_keeps_longest_member(spark, sf_dir):
    """Within every multi-doc cluster the canonical doc has max
    n_chars (doc_id-min tie-break), and exactly one member per cluster
    is kept."""
    from tfl_bikes_data_pipeline_spark import registry

    out = registry.QUERIES["q_dedup_canonical"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = out.join(docs, "doc_id")
    per_cluster = j.groupBy("cluster_id").agg(
        F.sum("keep").alias("n_keep"),
        F.max("n_chars").alias("max_chars"),
        F.count(F.lit(1)).alias("n_members"),
    )
    assert per_cluster.where(F.col("n_keep") != 1).count() == 0
    canon = j.where(F.col("keep") == 1).join(
        per_cluster.select("cluster_id", "max_chars"), "cluster_id"
    )
    assert canon.where(F.col("n_chars") != F.col("max_chars")).count() == 0


def test_canonical_covers_every_document(spark, sf_dir):
    """The decision surface is total: one row per corpus document
    (singletons keep themselves)."""
    from tfl_bikes_data_pipeline_spark import registry

    out = registry.QUERIES["q_dedup_canonical"](spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    singles = out.where(
        (F.col("cluster_id") == F.col("doc_id"))
        & (F.col("canonical_id") == F.col("doc_id"))
    )
    assert singles.where(F.col("keep") != 1).count() == 0


def test_source_overlap_bounds_and_symmetric_input(spark, sf_dir):
    """jaccard ∈ (0, 1]; common ≤ min(vocab sizes) — and each unordered
    pair appears at most once."""
    docs = load_table(spark, sf_dir, "documents")
    out = source_overlap(docs)
    rows = out.collect()
    assert all(0.0 < r.jaccard <= 1.0 for r in rows)
    assert all(r.source_a < r.source_b for r in rows)
    pairs = [(r.source_a, r.source_b) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_ann_recall_eval_bounds_and_floor(spark, sf_dir):
    """Recall is a valid ratio per query, and the IVF configuration's
    measured quality stays above the documented floor (0.6 per query,
    0.7 mean at fixture scales — regression guard for probe-count or
    assignment changes)."""
    from tfl_bikes_data_pipeline_spark import registry

    rows = registry.QUERIES["q_ann_recall_eval"](spark, sf_dir).collect()
    assert rows, "recall eval returned no queries"
    assert all(0.0 <= r.recall <= 1.0 for r in rows)
    assert all(r.recall >= 0.6 for r in rows)
    assert sum(r.recall for r in rows) / len(rows) >= 0.7


def test_leakage_safe_split_coassigns_duplicates(spark):
    """The whole point: a reordered / re-multiplied copy of a document
    must land in the same split as the original (an id-hashed split
    would scatter them)."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import wordset_fingerprint
    from tfl_bikes_data_pipeline_spark.operators.training import split_assign

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "delta gamma beta alpha"),          # reordered
            (3, "alpha alpha beta beta gamma delta"),  # re-multiplied
            (4, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    out = split_assign(docs.withColumn("fp", wordset_fingerprint()), "fp")
    splits = {r.doc_id: r.split for r in out.collect()}
    assert splits[1] == splits[2] == splits[3]


def test_hybrid_rrf_consensus_beats_single_system(spark, sf_dir):
    """RRF's defining property: a doc ranked by BOTH systems must
    outscore a doc holding the same rank in only one system, and every
    fused score must equal 1/(60+r_lex) + 1/(60+r_vec) recomputed from
    the component rankings."""
    from tfl_bikes_data_pipeline_spark.operators.retrieval import (
        HYBRID_QVEC,
        HYBRID_TOP_K,
        RRF_K,
        bm25_topk,
        hybrid_rrf_topk,
    )
    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        _vecs,
        cosine_topk,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    fused = {r.doc_id: r.rrf for r in hybrid_rrf_topk(docs, emb).collect()}
    lex = {
        r.doc_id: i + 1
        for i, r in enumerate(bm25_topk(docs, k=HYBRID_TOP_K).collect())
    }
    corpus = _vecs(emb, "vec_id", "cv")
    queries = _vecs(
        emb.where(F.col("vec_id") == HYBRID_QVEC), "qid", "qv"
    )
    vec = {
        r.vec_id: r.rank
        for r in cosine_topk(corpus, queries, k=HYBRID_TOP_K).collect()
    }
    for doc_id, rrf in fused.items():
        want = round(
            (1.0 / (RRF_K + lex[doc_id]) if doc_id in lex else 0.0)
            + (1.0 / (RRF_K + vec[doc_id]) if doc_id in vec else 0.0),
            6,
        )
        assert abs(rrf - want) < 1e-9, (doc_id, rrf, want)
    both = set(lex) & set(vec)
    if both:  # consensus doc must beat any single-system doc at equal rank
        d = min(both, key=lambda x: max(lex[x], vec[x]))
        floor = 1.0 / (RRF_K + max(lex[d], vec[d]))
        assert fused[d] > floor


def test_rbo_hand_computed_curve(spark):
    """RBO on a hand-computable pair of runs: lex = [A,B,C],
    vec = [B,A,D]. Overlaps by depth: 0, 2, 2 → terms 0, 0.9·1,
    0.81·round(2/3, 6) → RBO prefix 0, 0.09, 0.144000027 (exact on the
    decimal grid, no float folding anywhere before the final cast)."""
    import pytest

    from tfl_bikes_data_pipeline_spark.operators.retrieval import (
        rank_biased_overlap,
    )

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], ["doc_id", "rank_lex"]
    )
    vec = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], ["doc_id", "rank_vec"]
    )
    rows = rank_biased_overlap(lex, vec, k=3).collect()
    assert [(r.depth, r.n_overlap) for r in rows] == [(1, 0), (2, 2), (3, 2)]
    assert rows[0].rbo_at_depth == pytest.approx(0.0, abs=0)
    assert rows[1].rbo_at_depth == pytest.approx(0.09, abs=1e-12)
    assert rows[2].rbo_at_depth == pytest.approx(0.144000027, abs=1e-12)


def test_source_overlap_prune_is_lossless_and_single_shuffles_postings(spark):
    """r9 verdict task 5: the rebuilt source-overlap must (a) drop
    single-source shingles from pair generation WITHOUT changing any
    output (they still count toward per-source vocabulary sizes — the
    jaccard denominators prove it), and (b) shuffle the postings once
    (groupBy shingle), not three times (the old distinct + self-join)."""
    from tfl_bikes_data_pipeline_spark.operators.retrieval import source_overlap

    # 3-word docs = exactly one 3-gram shingle per doc.
    # "u v w" appears ONLY in src_a (single-source: prunable, but it
    # must still inflate src_a's vocabulary size); "x y z" is shared by
    # all three; "p q r" by (a, b) only.
    docs = spark.createDataFrame(
        [
            (1, "src_a", "x y z"),
            (2, "src_a", "u v w"),
            (3, "src_a", "p q r"),
            (4, "src_b", "x y z"),
            (5, "src_b", "p q r"),
            (6, "src_c", "x y z"),
        ],
        ["doc_id", "source", "text"],
    )
    rows = {
        (r.source_a, r.source_b): (r.common, r.jaccard)
        for r in source_overlap(docs).collect()
    }
    # sizes: a=3, b=2, c=1. common: (a,b)=2, (a,c)=1, (b,c)=1.
    assert rows[("src_a", "src_b")] == (2, 2 / (3 + 2 - 2))
    assert rows[("src_a", "src_c")] == (1, 1 / (3 + 1 - 1))  # u v w counted in |a|
    assert rows[("src_b", "src_c")] == (1, 1 / (2 + 1 - 1))
    assert len(rows) == 3

    # plan shape: no join keyed on the shingle column anywhere (the
    # postings self-join is gone); the only joins left are the two
    # bounded size-lookup joins on source_a / source_b
    plan = plan_of(source_overlap(docs))
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines, plan  # the size lookups are still joins
    assert all("shingle" not in l for l in join_lines), plan
