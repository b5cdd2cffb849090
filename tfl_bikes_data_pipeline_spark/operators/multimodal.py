"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

The Spark-side machinery is real and tested — schema contracts, binary
columns, batch iteration, partition-preserving transforms. The actual
codecs (image decode, audio resample, video frame-sample) are STUBBED:
the container has no image/audio libraries, so ``decode_image`` etc.
raise ``NotImplementedError`` with a clear marker, and the declared
query uses ``fake_decode_meta`` — a deterministic byte-level "decode"
(header-peek arithmetic on the payload) that exercises the identical
dataflow: binary in, struct of typed metadata out, one Arrow batch at a
time, no driver round-trip.

Scale notes: payload bytes never leave the executors; metadata
extraction is mapInPandas (narrow, no shuffle); downstream analytics
group on the extracted metadata only. At 100 TB the binary column
rides in parquet with column pruning keeping it unscanned unless the
query touches it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

META_SCHEMA = (
    "doc_id long, byte_len long, width int, height int, n_frames int, format string"
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: no imaging library in this container.
    The Spark plumbing around it (binary column → mapInPandas → typed
    struct) is real; swap this body for PIL/opencv in a full runtime."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes) -> "object":
    raise NotImplementedError("audio codec not available in this environment")


def sample_video_frames(payload: bytes, every_n: int) -> "list[object]":
    raise NotImplementedError("video codec not available in this environment")


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for a codec header parse: derives typed
    metadata purely from the bytes. Same signature/shape a real decoder
    would produce."""
    n = len(payload)
    return {
        "byte_len": n,
        "width": n % 640,
        "height": (n * 7) % 480,
        "n_frames": n % 16 + 1,
        "format": "img" if n % 2 == 0 else "vid",
    }


def attach_payload(documents: DataFrame) -> DataFrame:
    """Opaque binary payload column (UTF-8 bytes of text stands in for
    real media bytes; real ingest would read files into `binary`)."""
    return documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def extract_meta(with_payload: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: Arrow batches of (doc_id,
    payload) in, typed metadata rows out. Narrow transform — no
    shuffle, executor-local."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(fake_decode_meta)
            out = pd.DataFrame(list(meta))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return with_payload.mapInPandas(op, schema=META_SCHEMA)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = load_table(spark, sf_dir, "documents")
    return extract_meta(attach_payload(documents)).orderBy("doc_id")


FRAME_EVERY_N = 4


def sample_frames(meta: DataFrame, every_n: int = FRAME_EVERY_N) -> DataFrame:
    """Frame sampling over video-format payloads: one output row per
    kept frame (indices 0, n, 2n, ...), with a deterministic per-frame
    feature standing in for the decoded-frame embedding (real decoder
    drops into the same mapInPandas seam; see sample_video_frames).
    Row-expanding batch transform — output batches are larger than
    input batches, the shape a real frame sampler produces."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["format"] == "vid"]
            rows = {"doc_id": [], "frame_idx": [], "feature": []}
            for doc_id, n_frames in zip(vids["doc_id"], vids["n_frames"]):
                for idx in range(0, int(n_frames), every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["feature"].append(int(doc_id * 31 + idx) % 997)
            yield pd.DataFrame(rows)

    return meta.mapInPandas(op, schema="doc_id long, frame_idx int, feature int")


def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = load_table(spark, sf_dir, "documents")
    meta = extract_meta(attach_payload(documents))
    return sample_frames(meta).orderBy("doc_id", "frame_idx")


ORACLES: dict[str, str] = {
    # strlen() is byte length in DuckDB — identical to len(utf-8 bytes).
    "q_multimodal_meta": """
        SELECT doc_id,
               strlen(text)::BIGINT AS byte_len,
               (strlen(text) % 640)::INT AS width,
               ((strlen(text) * 7) % 480)::INT AS height,
               (strlen(text) % 16 + 1)::INT AS n_frames,
               CASE WHEN strlen(text) % 2 = 0 THEN 'img' ELSE 'vid' END AS format
        FROM documents ORDER BY doc_id
    """,
    # frames 0, 4, 8, ... of each 'vid' payload, feature = deterministic
    # stand-in arithmetic — integer-exact in both engines.
    "q_multimodal_framesample": f"""
        WITH meta AS (
            SELECT doc_id, (strlen(text) % 16 + 1)::INT AS n_frames
            FROM documents WHERE strlen(text) % 2 = 1
        )
        SELECT doc_id,
               (f * {FRAME_EVERY_N})::INT AS frame_idx,
               ((doc_id * 31 + f * {FRAME_EVERY_N}) % 997)::INT AS feature
        FROM meta, range(0, 16) t(f)
        WHERE f * {FRAME_EVERY_N} < n_frames
        ORDER BY doc_id, frame_idx
    """,
}

QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_multimodal_framesample": q_multimodal_framesample,
}

BENCH: list = []
