"""Multimodal column plumbing: opaque binary payloads + typed metadata.

[extension — not in the reference] Pattern for image/audio/video at
100 TB: the payload is an opaque ``binary`` column co-located with typed
metadata (``modality``, ``mime``, ``n_bytes``); decode / feature-extract
runs as Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row-at-a-time.

The container has no image/audio codecs, so the actual decode is a
STUB: :func:`decode_stub` raises ``NotImplementedError`` by design, and
:func:`extract_features` uses a deterministic byte-level extractor
(sha256, length, byte histogram head) — the Spark-side plumbing (schema,
batching, partition parallelism) is real and tested; swap
``_FEATURE_FN`` for a real codec worker on a cluster with libs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("head_byte", T.IntegerType()),
])


def binarize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Make a multimodal-shaped table from a text fixture: payload =
    UTF-8 bytes, plus typed metadata columns. (Real pipelines load the
    payload from object storage; the column layout is identical.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("content"),
        F.lit("text").alias("modality"),
        F.lit("text/plain; charset=utf-8").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )


def decode_stub(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Where a real image/audio decode would run. Deliberately stubbed:
    the container ships no codecs."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "container; extract_features() demonstrates the identical "
        "mapInPandas plumbing with a byte-level extractor"
    )


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched worker: bytes in, features out. Runs once per
    partition batch — the shape a real codec worker would have.
    NULL payloads yield NULL features (a codec worker must tolerate
    missing blobs without failing the task)."""
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": pd.array(
                [len(b) if b is not None else None for b in content],
                dtype="Int64"),
            "sha256": [hashlib.sha256(b).hexdigest() if b is not None
                       else None for b in content],
            "head_byte": pd.array(
                [(b[0] if len(b) else -1) if b is not None else None
                 for b in content],
                dtype="Int32"),
        })


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    partition-parallel, Arrow transfer, bounded memory per batch."""
    return df.select("doc_id", "content").mapInPandas(
        _extract_batch, schema=FEATURE_SCHEMA
    )
