"""Document chunking and sequence packing — training-data preparation.

[extension] A pretraining pipeline turns a document corpus into
fixed-size training sequences in two steps this module provides:

1. **Chunking**: split each document into overlapping windows
   (``chunk_documents``) — one row in, N rows out, all JVM-side
   (sequence + posexplode + substring; no UDF, no shuffle).
2. **Packing**: group small pieces into budget-bounded bins so every
   training sequence is near-full. Two strategies:

   - ``pack_offsets`` — assign each piece a bin by its *starting
     offset* in the (per-group) cumulative size: one window cumsum,
     fully parallel, deterministic under any engine. Pieces may
     straddle a bin boundary (the standard scalable relaxation —
     the consumer splits or truncates the straddler).
   - ``pack_next_fit`` — exact next-fit (a piece never straddles;
     open a new bin when the current one can't take it). Sequential
     within a group, so it runs as Arrow-batched ``applyInPandas``
     per group — parallel across groups, exact within.

At 100 TB: chunking is a narrow map (scales linearly); packing
shuffles once on the group key, and bins are local to a group —
choose the group column (language, source, shard) so groups fit an
executor (the same contract as any groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, chunk_chars_) — overlapping windows.

    Window *i* covers characters ``[i*stride, i*stride + chunk_chars)``
    with ``stride = chunk_chars - overlap``; the number of windows is
    ``max(1, ceil((length - overlap) / stride))`` so the final window
    always reaches the end of the document. Character-based (substring
    semantics are identical across engines, including non-ASCII).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(text_col) - F.lit(overlap)) / F.lit(stride)),
    ).cast("int")
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_text"),
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx", "_i"),
    )
    chunk = F.expr(f"substring(_text, _i * {stride} + 1, {chunk_chars})")
    return base.select(
        "id",
        "chunk_idx",
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_chars_"),
    )


def pack_offsets(
    df: DataFrame,
    size_col: str,
    order_col: str | list[str],
    budget: int,
    group_col: str | None = None,
) -> DataFrame:
    """Assign each piece a bin id by cumulative-offset binning.

    ``bin = floor(offset / budget)`` where ``offset`` is the cumulative
    size of all preceding pieces in ``order_col`` order (per group).
    One window cumsum — no sequential state, identical results on any
    engine and any partitioning, PROVIDED ``order_col`` is a total
    order within each group (pass a list ending in a unique key when a
    single column has ties — a tied order makes the cumsum, and hence
    bin boundaries, partition-order-dependent). Pieces may straddle
    bin boundaries.

    With ``group_col`` the cumsum window is partitioned by group
    (parallel). Without it, the global prefix sum goes through the
    two-stage construction in :mod:`db2pq_spark.operators.ranking` —
    no single-partition window at any input size.
    """
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    # explicit floor: engines disagree on double→int cast (truncate vs
    # round-to-nearest), floor() is unambiguous everywhere
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(*order)
        offset = F.sum(size_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1))
        return df.withColumn(
            "bin",
            F.floor(F.coalesce(offset, F.lit(0)) / F.lit(budget))
            .cast("bigint"),
        )
    from db2pq_spark.operators.ranking import with_global_prefix_sum

    staged = with_global_prefix_sum(
        df, size_col, [F.asc(c) if isinstance(c, str) else c for c in order],
        out_col="_offset")
    return (staged.withColumn(
        "bin", F.floor(F.col("_offset") / F.lit(budget)).cast("bigint"))
        .drop("_offset"))


def pack_next_fit(
    df: DataFrame,
    size_col: str,
    order_col: str,
    budget: int,
    group_col: str,
) -> DataFrame:
    """Exact next-fit packing per group (no straddling): walk pieces in
    ``order_col`` order, open a new bin whenever the current bin cannot
    fit the next piece. Oversized pieces (> budget) get a bin of their
    own. Sequential per group → ``applyInPandas``; groups run in
    parallel."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bin bigint"

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        bins, current, used = [], 0, 0
        for size in pdf[size_col]:
            s = int(size)
            if used > 0 and used + s > budget:
                current += 1
                used = 0
            bins.append(current)
            used += s
        return pdf.assign(bin=pd.array(bins, dtype="int64"))

    return df.groupBy(group_col).applyInPandas(fold, out_schema)
