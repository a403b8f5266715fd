"""Embedding quantization — int8 scalar storage for vector columns.

[extension — not in the reference] At 100 TB an ``array<float>``
embedding column is routinely the widest thing in the table; symmetric
per-vector int8 scalar quantization cuts it 4× with bounded error
(|err| ≤ scale/2 per component) and keeps dot products cheap. This is
the storage-side companion of :mod:`.similarity`: quantize for the
corpus at rest, dequantize (or score int8-native) at query time.

Everything is a narrow codegen'd projection — no shuffle, no UDF, no
Python: per-vector max-abs, one ``transform`` to ints, one back. The
arithmetic (``round(x / (amax/127))``, round-half-away-from-zero on
float64) is engine-portable — the q110 oracle replays it in DuckDB
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_embeddings", "dequantize", "quantization_error",
           "quantized_cosine_topk"]

#: symmetric int8 range
_QMAX = 127


def _amax(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))


def quantize_embeddings(
    df: DataFrame, vec_col: str, out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Add ``out_col`` (``array<tinyint>``) and ``scale_col``
    (double): symmetric per-vector int8 quantization with scale
    ``max|x| / 127``. All-zero (or empty) vectors get scale 0 and
    all-zero codes; NULL vectors stay NULL. Reconstruction is
    ``code * scale`` (:func:`dequantize`), component error ≤ scale/2."""
    vec = F.col(vec_col)
    amax = _amax(vec)
    # NULL vector ⇒ NULL scale (guarded first — amax over NULL is NULL,
    # which would otherwise fall through when() to the 0.0 arm and make
    # a NULL vector indistinguishable from an all-zero one by scale)
    scale = F.when(vec.isNull(), F.lit(None).cast("double")) \
             .when(amax > 0, amax / F.lit(float(_QMAX))) \
             .otherwise(F.lit(0.0))
    codes = F.transform(
        vec,
        lambda x: F.when(F.col(scale_col) > 0,
                         F.round(x.cast("double") / F.col(scale_col), 0))
                   .otherwise(F.lit(0.0)).cast("tinyint"))
    return (df.withColumn(scale_col, scale)
              .withColumn(out_col, codes))


def dequantize(qvec: Column | str, scale: Column | str) -> Column:
    """``array<double>`` reconstruction of an int8 code vector."""
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(q, lambda c: c.cast("double") * s)


def quantized_cosine_topk(
    corpus_q: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Top-k search over an int8-quantized corpus at rest — the
    companion query path to :func:`quantize_embeddings`.

    ``corpus_q`` carries codes + per-vector scales (the 4×-smaller
    stored form); queries stay full-precision. Reconstruction
    (``code * scale``) is fused into the scan as a narrow ``transform``
    — no extra shuffle, no materialized float corpus — and the scoring
    plan is exactly :func:`..similarity.cosine_topk`'s (broadcast
    queries, per-query window rank). The cosine over reconstructed
    vectors is deterministic arithmetic on identical operands in every
    engine, so the result carries an exact oracle (q115) — and because
    reconstruction error is bounded by scale/2 per component, the
    recall-vs-full-precision tradeoff is measurable, not anecdotal
    (QUALITY.md)."""
    from db2pq_spark.operators.similarity import cosine_topk

    deq = corpus_q.select(
        F.col(id_col),
        dequantize(qvec_col, scale_col).alias(vec_col))
    return cosine_topk(deq, queries, k, id_col, vec_col, round_digits)


def quantization_error(
    df: DataFrame, vec_col: str, qvec_col: str = "qvec",
    scale_col: str = "qscale", out_col: str = "abs_err_max",
) -> DataFrame:
    """Per-vector max absolute reconstruction error (bounded by
    scale/2 — asserted in tests). Narrow, no shuffle."""
    err = F.array_max(F.zip_with(
        F.col(vec_col), dequantize(qvec_col, scale_col),
        lambda x, r: F.abs(x.cast("double") - r)))
    return df.withColumn(out_col, err)
