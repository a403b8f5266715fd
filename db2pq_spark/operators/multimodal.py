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


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("resized", T.BinaryType()),
    T.StructField("out_bytes", T.IntegerType()),
])


def resize(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Deterministic fake "resize": stride-sample each payload down to
    exactly ``target_bytes`` (shorter payloads pass through).

    Stands in for an image resize: same plumbing (binary in → smaller
    binary out, fixed output size, Arrow batches, partition-parallel),
    with a codec-free deterministic kernel — ``out[i] =
    in[i * len(in) // target]``. Swap the kernel for PIL/libvips on a
    cluster that ships codecs; schema and batch shape stay identical."""

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["content"]:
                if b is None:
                    out.append(None)
                elif len(b) <= target_bytes:
                    out.append(bytes(b))
                else:
                    n = len(b)
                    out.append(bytes(b[i * n // target_bytes]
                                     for i in range(target_bytes)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "resized": out,
                "out_bytes": pd.array(
                    [len(b) if b is not None else None for b in out],
                    dtype="Int32"),
            })

    return df.select("doc_id", "content").mapInPandas(
        _resize_batch, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_md5", T.StringType()),
    T.StructField("frame_bytes", T.IntegerType()),
])


def frame_sample(df: DataFrame, frame_bytes: int = 64,
                 stride: int = 4) -> DataFrame:
    """Deterministic fake video frame sampling: treat the payload as a
    sequence of fixed-size frames and keep every ``stride``-th one.

    Exercises the 1-row-in → N-rows-out fan-out a real frame sampler
    has (mapInPandas output is not row-aligned with its input — that is
    the point of using it over a scalar pandas_udf). Frames are emitted
    as (doc_id, frame_idx, md5, size) so downstream dedup/similarity can
    run on frames without carrying the bytes; a real decoder would emit
    the pixel tensor column instead."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s, sizes = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["content"]):
                if b is None:
                    continue
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, stride):
                    chunk = bytes(b[fi * frame_bytes:(fi + 1) * frame_bytes])
                    ids.append(doc_id)
                    idxs.append(fi)
                    md5s.append(hashlib.md5(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame({
                "doc_id": pd.array(ids, dtype="Int64"),
                "frame_idx": pd.array(idxs, dtype="Int32"),
                "frame_md5": md5s,
                "frame_bytes": pd.array(sizes, dtype="Int32"),
            })

    return df.select("doc_id", "content").mapInPandas(
        _frames, schema=FRAME_SCHEMA)


def extract_features_arrow(df: DataFrame) -> DataFrame:
    """Arrow-native feature extraction via ``mapInArrow`` — identical
    semantics to :func:`extract_features`, minus the pandas layer.

    ``mapInArrow`` hands the worker raw ``pyarrow.RecordBatch``es: no
    pandas Block conversion, no object-dtype boxing of the binary
    payloads (the single biggest overhead when rows are megabyte
    blobs). This is the preferred shape for a real codec worker; the
    pandas variant stays as the readability baseline and parity check
    (tests assert equal output)."""
    import pyarrow as pa

    def _extract(batches):
        for batch in batches:
            doc_id = batch.column("doc_id")
            content = batch.column("content")
            n_bytes, sha, head = [], [], []
            for b in content:
                buf = b.as_py()
                if buf is None:
                    n_bytes.append(None); sha.append(None); head.append(None)
                else:
                    n_bytes.append(len(buf))
                    sha.append(hashlib.sha256(buf).hexdigest())
                    head.append(buf[0] if len(buf) else -1)
            yield pa.RecordBatch.from_arrays(
                [doc_id,
                 pa.array(n_bytes, type=pa.int64()),
                 pa.array(sha, type=pa.string()),
                 pa.array(head, type=pa.int32())],
                names=["doc_id", "n_bytes", "sha256", "head_byte"])

    return df.select("doc_id", "content").mapInArrow(
        _extract, schema=FEATURE_SCHEMA)
