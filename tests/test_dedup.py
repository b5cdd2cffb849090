"""Semantic tests for the dedup operators on crafted inputs — the
oracle differential proves engine-equivalence; these prove the
operators actually find duplicates."""

import pytest
from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.operators.dedup import (
    COSINE_DUP_THRESHOLD,
    JACCARD_THRESHOLD,
    embedding_cosine_pairs,
    embedding_cosine_pairs_blocked,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_candidate_pairs,
    shingle_rel,
    shingle_sets,
    simhash,
    verify_candidates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm windowsill", "cold windowsill")  # 2 shingles differ
FAR = (
    "completely different content about spark query engines and shuffle "
    "partitioning strategies for large scale distributed aggregation jobs"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)]  # 4 = exact dup of 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    sets = shingle_sets(docs)
    cands = lsh_candidate_pairs(minhash_signatures(sets))
    pairs = {(r.doc_a, r.doc_b) for r in verify_candidates(sets, cands, 0.5).collect()}
    assert (1, 2) in pairs, "near-dup pair missed by LSH"
    assert (1, 4) in pairs, "exact dup pair missed by LSH"
    assert not any(3 in p for p in pairs), "unrelated doc flagged"


def test_lsh_candidates_subset_of_jaccard_universe(spark, docs):
    """LSH prunes candidate generation; verified pairs must be a subset
    of (and here equal to) the exhaustive jaccard pairs."""
    exhaustive = {(r.doc_a, r.doc_b) for r in jaccard_pairs(shingle_rel(docs), 0.5).collect()}
    sets = shingle_sets(docs)
    cands = lsh_candidate_pairs(minhash_signatures(sets))
    lsh = {(r.doc_a, r.doc_b) for r in verify_candidates(sets, cands, 0.5).collect()}
    assert lsh <= exhaustive
    assert lsh == exhaustive  # at this similarity level, full recall


def test_simhash_exact_dups_collide_near_dups_close(spark, docs):
    hashes = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert hashes[1] == hashes[4], "identical docs must collide"
    ham = bin(hashes[1] ^ hashes[2]).count("1")
    ham_far = bin(hashes[1] ^ hashes[3]).count("1")
    assert ham <= ham_far, "near-dup should be at most as distant as unrelated doc"


def test_embedding_near_dup_planted(spark):
    v1 = [1.0, 0.0, 0.5, 0.2]
    v1_dup = [0.999, 0.001, 0.5, 0.2]
    v_orth = [0.0, 1.0, -0.5, 0.3]
    emb = spark.createDataFrame(
        [(1, v1), (2, v1_dup), (3, v_orth)], ["vec_id", "embedding"]
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    pairs = {(r.vec_a, r.vec_b) for r in embedding_cosine_pairs(emb, 0.95).collect()}
    assert pairs == {(1, 2)}


def test_embedding_blocked_precision_and_recall(spark, sf_dir):
    """The IVF-blocked near-dup must be a SUBSET of the exact all-pairs
    result (blocking can only drop pairs, never invent them) with high
    recall on the fixture — the knob being nassign/num_centroids."""
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(emb, COSINE_DUP_THRESHOLD).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_blocked(emb, COSINE_DUP_THRESHOLD).collect()
    }
    assert blocked <= exact, "blocking must never invent pairs"
    assert exact, "fixture should contain planted embedding near-dups"
    recall = len(blocked) / len(exact)
    # nassign=5 multi-probe measured at recall 1.0 on sf0.001 and
    # sf0.01; the pinned floor is the VERDICT-r3 target, with slack for
    # fixture regeneration.
    assert recall >= 0.8, f"blocked recall {recall:.2f} below 0.8 floor"


def test_embedding_probed_precision_and_recall(spark, sf_dir):
    """The DECLARED q_dedup_embedding plan (asymmetric IVF probing with
    the three-level coarse→mid→fine assignment) must be a subset of
    exact all-pairs with recall ≥ 0.95 at the dedup threshold —
    measured 0.985 on sf0.001 and 1.0 on sf0.01; the floor leaves
    slack for fixture regeneration."""
    from tfl_bikes_data_pipeline_spark import registry
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(emb, COSINE_DUP_THRESHOLD).collect()
    }
    probed = {
        (r.vec_a, r.vec_b)
        for r in registry.QUERIES["q_dedup_embedding"](spark, sf_dir).collect()
    }
    assert probed <= exact, "probing must never invent pairs"
    assert exact, "fixture should contain planted embedding near-dups"
    recall = len(probed) / len(exact)
    assert recall >= 0.95, f"probed recall {recall:.2f} below 0.95 floor"


def test_df_cap_drops_only_boilerplate_only_pairs(spark):
    """With a tiny cap, docs whose ONLY overlap is a high-df boilerplate
    shingle produce no candidate pair, while pairs sharing rare
    shingles survive with their exact (uncapped) jaccard."""
    boiler = "terms of service apply"  # 4 words → 2 trigram shingles
    rows = [(i, f"{boiler} unique words number {i} padding token") for i in range(1, 9)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = shingle_rel(docs)
    cands = {
        (r.doc_a, r.doc_b)
        for r in ngram_candidate_pairs(sh, max_df=4).collect()
    }
    assert (100, 101) in cands, "rare-shingle pair pruned by the cap"
    assert not any(a < 100 and b < 100 for a, b in cands), (
        "boilerplate-only pairs must be pruned (df of boilerplate shingles = 8 > 4)"
    )
    # verified output carries the TRUE jaccard from the full sets
    verified = verify_candidates(shingle_sets(docs), ngram_candidate_pairs(sh, max_df=4), 0.5).collect()
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(sh, 0.5).collect()}
    for r in verified:
        assert abs(r.jaccard - exact[(r.doc_a, r.doc_b)]) < 1e-12


def test_capped_ngram_matches_uncapped_on_fixture(spark, sf_dir):
    """At the default NGRAM_MAX_DF the capped query loses nothing on
    the fixture: near-dup pairs share rare shingles, so the capped
    result equals the exhaustive inverted-index result."""
    from tfl_bikes_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rel(docs)
    uncapped = {
        (r.doc_a, r.doc_b) for r in jaccard_pairs(sh, JACCARD_THRESHOLD).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in verify_candidates(
            shingle_sets(docs), ngram_candidate_pairs(sh), JACCARD_THRESHOLD
        ).collect()
    }
    assert capped <= uncapped
    assert uncapped, "fixture should contain planted near-dups"
    recall = len(capped) / len(uncapped)
    assert recall == 1.0, f"df-cap lost planted near-dups (recall {recall:.2f})"


def test_planted_near_dups_in_fixture_found(spark, sf_dir):
    """The sf fixtures contain generator-planted near-duplicates; the
    exhaustive jaccard operator must find a non-empty pair set at
    threshold 0.5 with very high per-pair similarity."""
    from tfl_bikes_data_pipeline_spark.tables import load_table

    sh = shingle_rel(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_pairs(sh, 0.5).collect()
    assert len(pairs) > 0
    assert max(r.jaccard for r in pairs) > 0.8


def test_two_level_assign_recall_vs_flat(spark):
    """The hierarchical coarse→fine assignment (the O(n·√k) scale path
    for the flat scorer's O(n·k) term) must reproduce the flat-assign
    pair set with high recall and never invent pairs outside the exact
    all-pairs universe. Measured 1.0 on sf0.01 at default knobs; floor
    pinned with slack for fixture regeneration."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        embed_block_num_centroids,
        embedding_cosine_pairs_blocked,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table, table_row_count

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    k = embed_block_num_centroids(table_row_count(sf, "embeddings"))
    flat = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_blocked(
            emb, COSINE_DUP_THRESHOLD, num_centroids=k
        ).collect()
    }
    two = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_blocked(
            emb, COSINE_DUP_THRESHOLD, num_centroids=k, assign_mode="two_level"
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(emb, COSINE_DUP_THRESHOLD).collect()
    }
    assert two <= exact, "two-level blocking must never invent pairs"
    assert flat, "fixture should contain planted embedding near-dups"
    recall = len(two & flat) / len(flat)
    assert recall >= 0.9, f"two-level recall vs flat {recall:.2f} below 0.9 floor"


def test_pruned_ngram_jaccard_is_lossless(spark, sf_dir):
    """The upper-bound prune (ngram_jaccard_pairs_pruned) must produce
    EXACTLY the unpruned capped pipeline's result — the bound only
    skips pairs that cannot reach the threshold, never a qualifying
    pair, and surviving pairs carry the identical exact jaccard."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        ngram_candidate_pairs,
        ngram_jaccard_pairs_pruned,
        shingle_sets,
        verify_candidates,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, with_digests=False)
    postings = sets.select("doc_id", F.explode("sset").alias("shingle"))
    unpruned = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in verify_candidates(
            sets, ngram_candidate_pairs(postings), JACCARD_THRESHOLD
        ).collect()
    }
    pruned = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs_pruned(sets, JACCARD_THRESHOLD).collect()
    }
    assert pruned.keys() == unpruned.keys()
    for k, j in pruned.items():
        assert abs(j - unpruned[k]) < 1e-12


def test_segment_dedup_invariants(spark, sf_dir):
    """C4-style segment dedup: total kept segments across the corpus
    equals the number of DISTINCT segments (each survives exactly
    once), drops are non-negative, and a surviving document's text is
    a subsequence of its original segment stream."""
    import pyspark.sql.functions as F

    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        SEGMENT_WORDS,
        segment_dedup,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = segment_dedup(docs)
    rows = out.collect()
    assert rows, "segment dedup dropped every document"
    kept_total = sum(r["n_segments"] - r["n_dropped"] for r in rows)
    # distinct segment count computed independently
    words = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("w")
    )
    segs_expr = (
        f"transform(sequence(0, greatest(cast(ceil(size(w) / {SEGMENT_WORDS}.0) as int) - 1, 0)), "
        f"i -> concat_ws(' ', slice(w, i * {SEGMENT_WORDS} + 1, {SEGMENT_WORDS})))"
    )
    n_distinct = (
        words.select(F.explode(F.expr(segs_expr)).alias("s"))
        .where(F.col("s") != "")
        .distinct()
        .count()
    )
    assert kept_total == n_distinct
    for r in rows:
        assert r["n_dropped"] >= 0
        assert 1 <= r["n_segments"] - r["n_dropped"]


def test_probed_two_level_recall_vs_flat(spark, sf_dir):
    """The O(n·√k) two-level assignment behind the probed blocking must
    reproduce the flat probed pair set with high recall and stay a
    subset of exact all-pairs."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        embedding_cosine_pairs_probed,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    flat = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_probed(emb, COSINE_DUP_THRESHOLD).collect()
    }
    two = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_probed(
            emb, COSINE_DUP_THRESHOLD, assign_mode="two_level"
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(emb, COSINE_DUP_THRESHOLD).collect()
    }
    assert two <= exact, "two-level probing must never invent pairs"
    assert flat, "flat probed baseline should find pairs on the fixture"
    recall = len(two & flat) / len(flat)
    assert recall >= 0.9, f"two-level probed recall vs flat {recall:.2f} < 0.9"


def test_probed_three_level_recall_vs_exact(spark, sf_dir):
    """The DECLARED O(n·k^(1/3)) three-level assignment behind the
    probed blocking must recover the exact all-pairs near-dup set with
    high recall (measured 0.985 on sf0.001 and 1.0 on sf0.01 at the
    default 4/8 probe knobs) and stay a subset of it."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        embedding_cosine_pairs_probed,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    three = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_probed(
            emb, COSINE_DUP_THRESHOLD, assign_mode="three_level"
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(emb, COSINE_DUP_THRESHOLD).collect()
    }
    assert three <= exact, "three-level probing must never invent pairs"
    assert exact, "fixture should contain planted embedding near-dups"
    recall = len(three & exact) / len(exact)
    assert recall >= 0.95, f"three-level probed recall vs exact {recall:.2f} < 0.95"


def test_icbrt_ceil_exact():
    """_icbrt_ceil must be the exact integer ⌈k^(1/3)⌉ (floored at 2) —
    including at perfect cubes and their neighbors, where float cube
    roots straddle integer boundaries."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import _icbrt_ceil

    for k in list(range(1, 2000)) + [10**6 - 1, 10**6, 10**6 + 1, 8_000_000]:
        c = _icbrt_ceil(k)
        assert c >= 2
        assert c**3 >= k
        if c > 2:
            assert (c - 1) ** 3 < k, f"k={k}: {c} not minimal"


def test_connected_components_converges_on_deep_chain(spark):
    """Pointer jumping must converge a chain far longer than the round
    cap (propagation distance doubles per round): a 40-link chain
    collapses to one component labeled by its min node well within
    max_iter=20 — the plain one-hop propagation would need 40 rounds
    and silently split the component."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, driver_edge_cap=0).collect()
    }
    assert set(labels.values()) == {0}, "chain fragmented across clusters"
    assert len(labels) == 41


def test_containment_finds_planted_excerpt(spark):
    """A short doc whose text is a verbatim excerpt of a long doc must
    surface as (excerpt, container) with containment 1.0 — the pair
    symmetric jaccard misses (their jaccard is far below threshold)."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        containment_pairs_pruned,
    )

    long_doc = " ".join(f"tok{i} tok{i+1} filler{i}" for i in range(40))
    excerpt = " ".join(long_doc.split(" ")[30:45])  # 15-word verbatim slice
    rows = [(1, long_doc), (2, excerpt), (3, "unrelated words entirely " * 5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sets = shingle_sets(docs, with_digests=False)
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs_pruned(sets, CONTAINMENT_THRESHOLD).collect()
    }
    assert (2, 1) in got and got[(2, 1)] == pytest.approx(1.0)
    # directionality: the long doc is NOT contained in the excerpt
    assert (1, 2) not in got
    # and jaccard indeed misses this pair (the motivating gap)
    jac = {
        (r.doc_a, r.doc_b)
        for r in verify_candidates(
            sets,
            spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"]),
            JACCARD_THRESHOLD,
        ).collect()
    }
    assert (1, 2) not in jac


def test_containment_prune_is_lossless(spark, sf_dir):
    """The integer upper-bound prune must match the unpruned verify
    (same candidate blocking, full-array containment on every
    candidate) exactly — value and pair set."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        containment_pairs_pruned,
        ngram_candidate_pairs,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, with_digests=False)
    postings = sets.where(F.col("n_shingles") > 0).select(
        "doc_id", F.explode("sset").alias("shingle")
    )
    cand_u = ngram_candidate_pairs(postings)
    cand = cand_u.unionByName(
        cand_u.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    pick = sets.select("doc_id", "sset", F.col("n_shingles").alias("n"))
    unpruned = {
        (r.doc_a, r.doc_b): r.containment
        for r in cand.join(
            pick.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sset").alias("sa"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            pick.select(F.col("doc_id").alias("doc_b"), F.col("sset").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.col("na").cast("double")
            ).alias("containment"),
        )
        .where(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .collect()
    }
    pruned = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs_pruned(sets, CONTAINMENT_THRESHOLD).collect()
    }
    assert pruned == unpruned


def test_duplicated_span_profile_planted_case(spark):
    """Hand-checkable geometry: doc 0 and doc 1 share a 10-word run
    (positions 0-9 in doc 0, 5-14 in doc 1); doc 2 is all-fresh text.
    With 8-token grams the shared run yields windows at positions 0-2
    of doc 0 (coverage 0..9 = 10 tokens) and 5-7 of doc 1 (coverage
    5..14 = 10 tokens) — ONE merged span each; doc 2 reports zero."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        duplicated_span_profile,
    )

    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, shared + " " + " ".join(f"a{i}" for i in range(6))),
            (1, " ".join(f"b{i}" for i in range(5)) + " " + shared + " b5 b6"),
            (2, " ".join(f"c{i}" for i in range(16))),
            (3, "too short"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in duplicated_span_profile(docs).collect()}
    assert rows[0].n_tokens == 16 and rows[0].dup_tokens == 10
    assert rows[0].n_spans == 1 and abs(rows[0].dup_ratio - 0.625) < 1e-9
    assert rows[1].n_tokens == 17 and rows[1].dup_tokens == 10
    assert rows[1].n_spans == 1
    assert rows[2].dup_tokens == 0 and rows[2].n_spans == 0
    assert rows[3].n_tokens == 2 and rows[3].dup_tokens == 0  # < gram guard


def test_duplicated_span_profile_merges_overlaps_exactly(spark):
    """Two duplicated grams overlapping within one doc must merge into
    one span whose length is the interval UNION, not the sum (the
    double-count a naive per-gram sum would produce)."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        duplicated_span_profile,
    )

    # doc 0 repeats its own opening 9 words at position 9 → grams at
    # 0,1 and 9,10 (plus cross-matches); doc 1 holds a disjoint copy.
    run = " ".join(f"w{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (0, run + " " + run),
            (1, run + " x0 x1 x2 x3 x4 x5 x6 x7 x8"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in duplicated_span_profile(docs).collect()}
    # doc 0's duplicated grams sit at positions 0,1 (match doc 1 and
    # pos 9,10) and 9,10 — islands [0,8] and [9,17] are ADJACENT
    # (9 = 8+1), and the pos > prev_max_e + 1 rule merges adjacency,
    # so the whole doc reports ONE 18-token span. This assertion pins
    # the adjacency-merge semantics (a strict-overlap rule would
    # report 2 spans of 9).
    assert rows[0].dup_tokens == 18 and rows[0].n_spans == 1
    # doc 1: only its first 9 tokens duplicate (grams at pos 0,1).
    assert rows[1].dup_tokens == 9 and rows[1].n_spans == 1


def test_connected_components_reliable_checkpoint_branch(spark, tmp_path):
    """The cluster-posture branch: with a RELIABLE checkpoint dir
    configured, each round runs through DataFrame.checkpoint() (HDFS
    posture — survives executor loss, lineage truncated on disk)
    instead of localCheckpoint(). Same fixpoint on the 40-link chain,
    and checkpoint files actually land in the configured dir. The dir
    is reset afterwards so the rest of the suite keeps exercising the
    localCheckpoint() branch."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None, "suite default should be local"
    ckpt = str(tmp_path / "cc_ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
        )
        labels = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs, driver_edge_cap=0).collect()
        }
        assert set(labels.values()) == {0}
        assert len(labels) == 41
        import glob
        import os

        written = glob.glob(os.path.join(ckpt, "**", "rdd-*"), recursive=True)
        assert written, "no reliable checkpoint files written — branch not taken"
    finally:
        # Scala setCheckpointDir(null) -> Option(null) = None: the only
        # way to UNSET the dir (the Python wrapper rejects None)
        sc._jsc.sc().setCheckpointDir(None)
        assert sc.getCheckpointDir() is None


def test_cc_driver_fast_path_matches_distributed_loop(spark):
    """The small-graph union-find fast path must produce the identical
    labeling to the distributed min-label loop on a multi-component
    graph — numeric ids AND string ids (entity resolution runs CC over
    text keys), including a chain, a star, a triangle-with-tail, and
    isolated-pair components."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    num_edges = (
        [(i, i + 1) for i in range(0, 9)]          # chain 0..9
        + [(100, x) for x in (101, 102, 103)]       # star
        + [(200, 201), (201, 202), (202, 200), (202, 203)]  # tri + tail
        + [(300, 301)]                              # pair
    )
    str_edges = [(f"n{a}", f"n{b}") for a, b in num_edges]
    for rows, schema in (
        (num_edges, "doc_a LONG, doc_b LONG"),
        (str_edges, "doc_a STRING, doc_b STRING"),
    ):
        pairs = spark.createDataFrame(rows, schema)
        fast = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(pairs).collect()
        }
        loop = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(pairs, driver_edge_cap=0).collect()
        }
        assert fast == loop
        # spot-check min-representative semantics on the numeric graph
        if "LONG" in schema:
            labels = dict(fast)
            assert labels[9] == 0 and labels[103] == 100
            assert labels[203] == 200 and labels[301] == 300


def test_connected_components_branches_agree_on_null_edges(spark):
    """Degenerate input discipline (r8 ADVICE): a null-keyed edge is
    dropped by the distributed loop's join semantics, so the driver
    union-find fast path must drop it too — not raise TypeError from
    comparing None with '<' — and the two branches must label the
    surviving graph identically."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    rows = [(1, 2), (2, None), (None, 3), (None, None), (4, 5)]
    pairs = spark.createDataFrame(rows, "doc_a LONG, doc_b LONG")
    fast = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    loop = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, driver_edge_cap=0).collect()
    }
    assert fast == loop
    labels = dict(fast)
    assert labels[2] == 1 and labels[5] == 4


def test_hyperplane_lsh_recall_and_subset(spark, sf_dir):
    """Hyperplane LSH (vector SimHash) must stay a subset of exact
    all-pairs and recover the fixture's borderline-similarity planted
    pairs with recall ≥ 0.75 at the default band count (measured 0.83
    on both gate SFs — the fixture's pairs all sit at cosine 0.4-0.6,
    the hardest angle regime for this family)."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        embedding_cosine_pairs_hyperplane,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table, table_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    n = table_row_count(sf_dir, "embeddings")
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_hyperplane(
            emb, COSINE_DUP_THRESHOLD, n
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs(emb, COSINE_DUP_THRESHOLD).collect()
    }
    assert got <= exact, "hyperplane blocking must never invent pairs"
    assert exact, "fixture should contain planted embedding near-dups"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.75, f"hyperplane recall vs exact {recall:.2f} < 0.75"


def test_hyperplane_bits_scales_bucket_population():
    """bits-per-band must track corpus size so expected bucket
    population stays ~HYPERPLANE_TARGET_POP: 2^bits >= n/TARGET with
    bits minimal."""
    from tfl_bikes_data_pipeline_spark.operators.dedup import (
        HYPERPLANE_TARGET_POP,
        hyperplane_bits,
    )

    for n in (100, 500, 5_000, 60_000, 1_000_000):
        b = hyperplane_bits(n)
        assert (1 << b) >= max(n // HYPERPLANE_TARGET_POP, 2)
        assert b == 1 or (1 << (b - 1)) < max(n // HYPERPLANE_TARGET_POP, 2)
