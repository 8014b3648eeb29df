"""Multimodal column handling: opaque binary payloads + typed metadata.

The pages table already carries one binary modality (html). This module
generalizes: a blob column plus metadata, with decode / feature-extraction
as Arrow-batched mapInPandas — the image/audio libraries are not in this
container, so the decode step is a clearly-marked deterministic STUB while
the Spark-side plumbing (schema, batch iteration, partitioning) is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("blob_bytes", T.LongType()),
        T.StructField("feature_dim", T.IntegerType()),
        T.StructField("feature_head", T.ArrayType(T.DoubleType())),
    ]
)


def blob_meta(docs: DataFrame) -> DataFrame:
    """Pure-expression metadata over a synthesized blob column (encode(text))
    — octet length, content fingerprint, synthetic modality tag. All
    JVM-side; mirrors the DuckDB oracle exactly."""
    blob = F.encode(F.col("text"), "utf-8")
    nbytes = F.octet_length(blob)
    return docs.select(
        "doc_id",
        nbytes.alias("blob_bytes"),
        F.md5(F.col("text")).alias("content_fp"),
        F.when(nbytes % 3 == 0, "image")
        .when(nbytes % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    ).orderBy("doc_id")


def _decode_stub(blob: bytes, modality: str) -> list[float]:
    """STUB: real image/audio decode is unavailable in this container
    (no PIL/av/librosa). Deterministic fake features derived from the
    bytes keep the pipeline testable end-to-end; swap this single function
    for a real decoder on a production cluster."""
    if blob is None:
        return []
    head = blob[:8].ljust(8, b"\0")
    return [float(b) / 255.0 for b in head]


def extract_features(docs_with_blob: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, blob, modality).

    mapInPandas so one Python worker processes whole Arrow batches; the
    blob column stays bytes end-to-end (no utf-8 mangling)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(b, m)
                for b, m in zip(pdf["blob"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "blob_bytes": [0 if b is None else len(b) for b in pdf["blob"]],
                    "feature_dim": [len(f) for f in feats],
                    "feature_head": feats,
                }
            )

    return docs_with_blob.mapInPandas(fn, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_chars", T.IntegerType()),
        T.StructField("frame_fp", T.StringType()),
    ]
)

FRAME_CHARS = 1024


def sample_frames(docs: DataFrame) -> DataFrame:
    """Frame sampling for a video-like payload: ONE input row fans out to
    N frame rows (the 1->N multimodal cardinality shape: mapInPandas yields
    more rows than it consumes, which select/withColumn cannot express).

    STUB decode: a real sampler would demux with av/ffmpeg; here a 'frame'
    is a fixed-width slice of the payload, which keeps the operator
    deterministic AND DuckDB-oracle-checkable while the Spark-side
    plumbing (Arrow batching, fan-out schema, partition independence) is
    fully real."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_chars": [], "frame_fp": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                for i in range(0, max(1, -(-len(text) // FRAME_CHARS))):
                    frame = text[i * FRAME_CHARS : (i + 1) * FRAME_CHARS]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_chars"].append(len(frame))
                    out["frame_fp"].append(hashlib.md5(frame.encode()).hexdigest())
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(fn, FRAME_SCHEMA)


def featurize_documents(docs: DataFrame) -> DataFrame:
    """documents -> synthesized blobs -> stub features (full plumbing)."""
    blob = F.encode(F.col("text"), "utf-8")
    nbytes = F.octet_length(blob)
    with_blob = docs.select(
        "doc_id",
        blob.alias("blob"),
        F.when(nbytes % 3 == 0, "image")
        .when(nbytes % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )
    return extract_features(with_blob)
