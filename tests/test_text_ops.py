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
