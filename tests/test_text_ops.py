"""Semantic properties of the text operators that the oracle hash
can't express directly (coverage/reconstruction invariants)."""

import pyspark.sql.functions as F

from tfl_bikes_data_pipeline_spark.operators.text import (
    CHUNK_CHARS,
    CHUNK_STRIDE,
    chunk_documents,
)
from tfl_bikes_data_pipeline_spark.tables import load_table


def test_chunks_reconstruct_original_text(spark, sf_dir):
    """Concatenating each chunk's first `stride` characters in chunk
    order must reproduce the document exactly — proves the windows
    tile the text with no gap, no loss, and correct overlap."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs)
    pieces = chunks.select(
        "doc_id",
        F.struct(
            "chunk_id", F.expr(f"substring(chunk_text, 1, {CHUNK_STRIDE})").alias("p")
        ).alias("s"),
    )
    rebuilt = (
        pieces.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select(
            "doc_id",
            F.array_join(F.expr("transform(arr, e -> e.p)"), "").alias("rebuilt"),
        )
    )
    mismatches = (
        docs.join(rebuilt, "doc_id")
        .where(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert mismatches == 0


def test_chunk_overlap_is_boundary_context(spark, sf_dir):
    """Adjacent full chunks share exactly chunk - stride characters:
    the tail of chunk i equals the head of chunk i+1."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs)
    overlap = CHUNK_CHARS - CHUNK_STRIDE
    nxt = chunks.select(
        "doc_id",
        (F.col("chunk_id") - 1).alias("chunk_id"),
        F.expr(f"substring(chunk_text, 1, {overlap})").alias("next_head"),
    )
    full = chunks.where(F.col("chunk_len") == CHUNK_CHARS)
    violations = (
        full.join(nxt, ["doc_id", "chunk_id"])
        .where(
            F.expr(f"substring(chunk_text, {CHUNK_STRIDE + 1}, {overlap})")
            != F.col("next_head")
        )
        .count()
    )
    assert violations == 0


def test_textrank_empty_graph_returns_empty(spark):
    """Single-token documents produce no co-occurrence edges; textrank
    must return an empty (word, rank) frame, not divide by zero."""
    from tfl_bikes_data_pipeline_spark.operators.text import textrank

    docs = spark.createDataFrame([(1, "solo"), (2, "word")], ["doc_id", "text"])
    out = textrank(docs)
    assert out.columns == ["word", "rank"]
    assert out.count() == 0


def test_sessionize_and_rolling_actives_handle_empty(spark):
    from tfl_bikes_data_pipeline_spark.operators.timeseries import (
        rolling_active_users,
        sessionize,
    )

    empty = spark.createDataFrame(
        [], "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    assert sessionize(empty).count() == 0
    assert rolling_active_users(empty).count() == 0


def test_bpe_merges_degenerate_corpus(spark):
    """A corpus with no adjacent pairs (1-word docs) yields zero merge
    rows rather than crashing."""
    from tfl_bikes_data_pipeline_spark.operators.text import bpe_merges

    docs = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    assert bpe_merges(docs).count() == 0


def test_text_oracles_hold_on_adversarial_corpus(spark):
    """Edge corpus from the round-5 review: empty text (0/0 ratio),
    vertical tab (Java \\s vs RE2 \\s divergence), single-word and
    repeated-token docs, digit runs, double/trailing spaces. The
    hardened quality/token/tfidf queries must stay in DuckDB lockstep
    on all of them."""
    import duckdb
    import pandas as pd

    from tests.oracle_utils import assert_matches_oracle
    from tfl_bikes_data_pipeline_spark import registry
    from tfl_bikes_data_pipeline_spark.operators.text import (
        quality_features,
        tfidf_top_terms,
        token_counts,
    )

    texts = [
        "",
        "tab\x0bhere and more words now ok",
        "one",
        "dup dup dup dup dup",
        "digits 12345 and 678 mixed 9",
        "double  space and trailing space ",
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))

    assert_matches_oracle(
        quality_features(docs).orderBy("doc_id"),
        con, registry.ORACLES["q_text_quality"], "quality/adversarial",
    )
    assert_matches_oracle(
        token_counts(docs).orderBy("doc_id"),
        con, registry.ORACLES["q_token_count"], "tokens/adversarial",
    )
    assert_matches_oracle(
        tfidf_top_terms(docs).orderBy("doc_id", "rank"),
        con, registry.ORACLES["q_text_tfidf"], "tfidf/adversarial",
    )


def test_tfidf_ranks_characteristic_terms_over_stopwords(spark):
    """The round-5 fix: ranking must follow tf/df (true TF-IDF order),
    not raw tf — a rare term must outrank a corpus-wide stopword that
    merely repeats inside the document."""
    from tfl_bikes_data_pipeline_spark.operators.text import tfidf_top_terms

    texts = ["the the the the zebra"] + ["the common filler words here"] * 9
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    top = [r.term for r in tfidf_top_terms(docs, k=1).where("doc_id = 0").collect()]
    assert top == ["zebra"], f"stopword outranked the characteristic term: {top}"


def test_mg_candidates_superset_of_exact_heavy_hitters(spark, sf_dir):
    """The Misra-Gries candidate set must contain EVERY phrase whose
    exact frequency meets the threshold — the guarantee that makes the
    exact-verify result independent of sketch tuning."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.text import (
        HH_RATIO,
        _mg_candidates,
        _with_words,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    grams = (
        "CASE WHEN size(w) >= 3 THEN "
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', slice(w, i + 1, 3))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    phrases = _with_words(docs).select(F.explode(F.expr(grams)).alias("word"))
    n_total = phrases.count()
    exact_hh = {
        r.word
        for r in phrases.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * HH_RATIO >= F.lit(n_total))
        .collect()
    }
    cand = {r.word for r in _mg_candidates(docs, 3, 8192).collect()}
    assert exact_hh <= cand, sorted(exact_hh - cand)[:5]


def test_heavy_hitters_counts_are_exact(spark, sf_dir):
    """Reported frequencies come from the exact verify pass, never the
    sketch estimate — compare against the naive groupBy-everything."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.text import (
        HH_RATIO,
        _with_words,
        heavy_hitter_phrases,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {(r.word, r.freq) for r in heavy_hitter_phrases(docs).collect()}
    grams = (
        "CASE WHEN size(w) >= 3 THEN "
        "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', slice(w, i + 1, 3))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    phrases = _with_words(docs).select(F.explode(F.expr(grams)).alias("word"))
    n_total = phrases.count()
    want = {
        (r.word, r.freq)
        for r in phrases.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * HH_RATIO >= F.lit(n_total))
        .collect()
    }
    assert got == want and len(got) > 0


def test_cdc_chunks_reconstruct_and_are_edit_stable(spark):
    """CDC invariants: (1) chunks joined in order reproduce the word
    stream; (2) appending words to a document leaves every earlier
    chunk byte-identical — the content-defined property a fixed-stride
    chunker cannot provide (an insertion shifts all later fixed
    boundaries)."""
    from tfl_bikes_data_pipeline_spark.operators.text import cdc_chunks

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra words appended here")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for d in by_doc.values():
        d.sort()
    rebuilt = " ".join(t for _, t in by_doc[1])
    assert rebuilt == base
    # every chunk of doc 1 except possibly the last must appear
    # verbatim, in order, at the head of doc 2's chunk list
    c1 = [t for _, t in by_doc[1]]
    c2 = [t for _, t in by_doc[2]]
    assert c2[: len(c1) - 1] == c1[:-1]


def test_cdc_chunks_is_narrow(spark, sf_dir):
    """CDC must stay scan-side: the ONLY Exchange allowed is the
    presentation sort's range partitioning."""
    from tfl_bikes_data_pipeline_spark import registry
    from .test_plan_quality import _exchange_count, plan_of

    plan = plan_of(registry.QUERIES["q_cdc_chunks"](spark, sf_dir))
    n = _exchange_count(plan)
    assert n <= 1, f"CDC chunking shuffles {n}× (budget 1: the sort)"


def test_phrase_scan_planted_positions(spark):
    """Exact positional semantics: the phrase occurs at known offsets,
    overlapping occurrences count separately, non-matches are absent."""
    from tfl_bikes_data_pipeline_spark.operators.text import phrase_scan

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            # phrase of doc 0 at positions 2 and 8
            (1, "x y alpha beta gamma delta epsilon zeta q r alpha beta gamma delta epsilon zeta"),
            (2, "completely different words with no shared phrase here"),
        ],
        ["doc_id", "text"],
    )
    phrases = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], ["phrase_id", "phrase"]
    )
    rows = {r.doc_id: r for r in phrase_scan(docs, phrases).collect()}
    assert rows[0].n_hits == 1 and rows[0].first_pos == 0
    assert rows[1].n_hits == 2 and rows[1].first_pos == 2
    assert 2 not in rows


def test_phrase_scan_multispace_edge_token(spark):
    """A double space inside a document produces an empty token; a
    phrase window whose EDGE token is empty space-joins with a
    trailing/leading space. The phrase digest must NOT trim that edge
    space away, or the engine misses hits the document grams (and the
    DuckDB oracle) contain (ADVICE r6)."""
    from tfl_bikes_data_pipeline_spark.operators.text import phrase_scan

    # "a b c d e  f" splits to [a,b,c,d,e,'',f]: window [a..''] is the
    # 6-gram "a b c d e " (trailing space), window [b..f] is
    # "b c d e  f" (double space inside).
    docs = spark.createDataFrame(
        [(0, "a b c d e  f"), (1, "z a b c d e  f z")],
        ["doc_id", "text"],
    )
    phrases = spark.createDataFrame(
        [(10, "a b c d e "), (11, "b c d e  f")], ["phrase_id", "phrase"]
    )
    rows = {
        (r.phrase_id, r.doc_id): r for r in phrase_scan(docs, phrases).collect()
    }
    # trailing-space edge phrase: found in both docs
    assert rows[(10, 0)].first_pos == 0
    assert rows[(10, 1)].first_pos == 1
    # interior double-space phrase: found in both docs
    assert rows[(11, 0)].first_pos == 1
    assert rows[(11, 1)].first_pos == 2


def test_min_k_prob_selects_bottom_fraction(spark):
    import pytest
    """Min-K% semantics on a planted corpus: a 5-token doc at k=20%
    selects exactly its single least-likely token, so its score IS that
    token's unigram logprob; an all-common doc scores the common
    token's logprob; and n_sel floors at 1 for short docs."""
    import math

    from tfl_bikes_data_pipeline_spark.operators.text import min_k_prob

    docs = spark.createDataFrame(
        [
            (0, "common common common common rare"),
            (1, "common common common common common"),
            (2, "common"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in min_k_prob(docs, k_pct=20).collect()}
    total = 11  # 5 + 5 + 1 tokens
    lp_rare = round(math.log(1 / total), 6)
    lp_common = round(math.log(10 / total), 6)
    assert rows[0].n_tokens == 5 and rows[0].n_sel == 1
    assert rows[0].mink_logprob == pytest.approx(lp_rare, abs=1e-9)
    assert rows[1].mink_logprob == pytest.approx(lp_common, abs=1e-9)
    assert rows[2].n_sel == 1  # floor at 1 token
    # memorization signal direction: the doc containing a rare token
    # scores LOWER (more surprising) than the all-common doc
    assert rows[0].mink_logprob < rows[1].mink_logprob
