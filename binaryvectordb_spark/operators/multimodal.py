"""Multimodal column plumbing (SURVEY §2.12): opaque binary payloads with
typed metadata, decoded/feature-extracted via Arrow-batched pandas on
``mapInPandas``.

The container has no image/audio libraries, so ``decode_image`` is a clearly
marked stub (NotImplementedError) and ``fake_decode_features`` is the
deterministic stand-in used by tests and the driver queries.  The Spark-side
plumbing — binary schema, Arrow batch shape, partition-parallel mapInPandas —
is real and is exactly what a real decoder would plug into.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("doc_id long, n_bytes int, mean_byte double, "
                 "max_byte int, checksum bigint")


def with_fake_payload(docs_df: DataFrame) -> DataFrame:
    """Attach a deterministic binary 'image' payload + typed metadata.
    (Real pipelines read the bytes from object storage; the md5-derived fake
    keeps tests hermetic while exercising real BinaryType columns.)"""
    return docs_df.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("image_bytes"),
        F.struct(
            (F.lit(64) + F.col("doc_id") % 64).cast("int").alias("width"),
            (F.lit(64) + F.col("n_chars") % 128).cast("int").alias("height"),
            F.element_at(F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
                         (F.col("doc_id") % 3 + 1).cast("int")).alias("format"),
        ).alias("meta"))


def decode_image(data: bytes):
    """Real decoder hook — not available in this container."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present here; "
        "use fake_decode_features for the deterministic test path")


def fake_decode_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic per-payload features (byte statistics) as a stand-in for
    a real decode+featurize step.  Vectorized over the Arrow batch."""
    arr = [np.frombuffer(b, dtype=np.uint8) for b in batch["image_bytes"]]
    return pd.DataFrame({
        "doc_id": batch["doc_id"].values,
        "n_bytes": [len(a) for a in arr],
        "mean_byte": [float(a.astype(np.float64).sum() / len(a)) for a in arr],
        "max_byte": [int(a.max()) for a in arr],
        "checksum": [int(a.astype(np.int64).sum()) for a in arr],
    })


def decode_features(payload_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column: Arrow-batched,
    partition-parallel, constant memory per batch — the scale path for any
    decode/resize/frame-sample operator."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield fake_decode_features(b)
    return payload_df.select("doc_id", "image_bytes").mapInPandas(
        gen, schema=DECODE_SCHEMA)
