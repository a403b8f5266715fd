"""Z-order (Morton) interleaving for multi-column data skipping.

[extension — scale path] Range-clustering a rewrite on ONE column gives
disjoint per-file min/max on that column only; predicates on a second
column still scan every file. Interleaving the bit patterns of several
columns into one sort key ("Z-order") makes every output file a small
hyper-rectangle in the combined key space, so parquet min/max
statistics prune files for predicates on ANY of the interleaved
columns. This is the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, expressed here as plain Spark expressions:

1. normalize each column to a ``bits``-bit integer bucket using its
   global min/max (one cheap agg pass — compaction reads the data
   anyway);
2. interleave the bucket bits JVM-side (an unrolled constant-size
   shift/or expression — stays inside whole-stage codegen);
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value.

Caveat (documented, inherent): min/max bucketing assumes a roughly
uniform spread; heavily skewed columns should be pre-transformed
(e.g. log) or bucketed by quantiles upstream. Two or three columns
interleave usefully; beyond that per-column selectivity decays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _numeric_proxy(df: DataFrame, col: str) -> Column:
    """Map a column to a numeric expression for min/max bucketing.

    Dates/timestamps map to days/seconds since epoch (ordering
    preserved — only relative position in [min, max] matters). Other
    non-numeric types have no meaningful distance for Z-bucketing —
    reject with a clear error instead of crashing in float()."""
    from pyspark.sql import types as T

    dtype = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dtype, T.NumericType):
        return c
    if isinstance(dtype, T.DateType):
        return F.datediff(c, F.lit("1970-01-01").cast("date"))
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return c.cast("timestamp").cast("double")
    raise ValueError(
        f"zorder column {col!r} has type {dtype.simpleString()}; "
        "only numeric, date, and timestamp columns interleave (use "
        "single-column range clustering for strings)")


def _bucket(col: Column, mn, mx, bits: int) -> Column:
    """Normalize a numeric column into [0, 2^bits) by global min/max."""
    if mn is None or mx is None:            # all-null column
        return F.lit(0).cast("long")
    span = float(mx) - float(mn)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(mn))) / F.lit(span)
    b = F.floor(scaled * F.lit((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), b))


def zvalue(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton-interleaved sort key over ``cols`` (numeric, date, or
    timestamp columns; NULLs land in bucket 0).

    Bit ``i`` of column ``j`` lands at position ``i * ncols + j`` —
    an unrolled shiftleft/or tree of ``bits × ncols`` terms, constant
    size, fully JVM-side."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zvalue interleaves 1-4 columns")
    proxies = [_numeric_proxy(df, c) for c in cols]
    stats = df.agg(*[f(p) for p in proxies
                     for f in (F.min, F.max)]).first()
    buckets = []
    for j, p in enumerate(proxies):
        mn, mx = stats[2 * j], stats[2 * j + 1]
        buckets.append(F.coalesce(_bucket(p, mn, mx, bits),
                                  F.lit(0).cast("long")))
    n = len(cols)
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder(df: DataFrame, cols: list[str], num_partitions: int,
           bits: int = 12) -> DataFrame:
    """Lay ``df`` out in ``num_partitions`` Z-ordered partitions: files
    written from the result have tight min/max on every interleaved
    column."""
    keyed = df.withColumn("_z", zvalue(df, cols, bits))
    return (keyed.repartitionByRange(num_partitions, "_z")
            .sortWithinPartitions("_z")
            .drop("_z"))
