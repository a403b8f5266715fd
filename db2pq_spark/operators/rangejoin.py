"""Binned range join: points-in-interval without an equi key.

[extension — not in the reference] Spark plans a join whose only
predicate is ``lo <= point <= hi`` as a BroadcastNestedLoopJoin (small
side) or a cartesian product — both quadratic. The standard scalable
rewrite (the same one behind Databricks' RANGE_JOIN hint) turns the
range predicate into an equi-join on *bins*:

- every point lands in exactly one bin: ``floor(point / bin_width)``;
- every interval is replicated into each bin it overlaps:
  ``sequence(floor(lo/w), floor(hi/w))`` exploded;
- an equi (shuffle or broadcast) hash join on the bin key + the exact
  range predicate as a residual filter.

Each matching (point, interval) pair is produced exactly once — the
point has one bin, so no post-join dedup is needed. Cost: the interval
side grows by the mean interval width / bin_width; the join itself is
a hash join that AQE can size, skew-split, or broadcast. Choosing
``bin_width`` ≈ the typical interval length keeps the replication
factor near 2.

Optional ``on`` equi keys compose (key + bin both enter the hash-join
key), for the "same user within an hour" shape — though with a
high-cardinality equi key Spark's plain hash join is already fine and
binning only tightens the residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin(col: str, width: float):
    # double-precision floor-divide: exact for |value| < 2^53, and bins
    # are only a pruning device — the residual predicate is exact.
    return F.floor(F.col(col).cast("double") / F.lit(float(width)))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval row with
    ``lo_col <= point_col <= hi_col`` (closed on both ends).

    ``how``: ``"inner"`` or ``"left"`` (``left`` preserves unmatched
    points — valid because each point occupies exactly one bin, so the
    left side is never replicated).

    Column names must be disjoint across the two inputs apart from the
    optional ``on`` equi keys — rename before joining otherwise.
    Intervals spanning many bins replicate proportionally; pick
    ``bin_width`` near the typical interval length (see module doc).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: rename one side "
            "(only `on` keys may be shared)")

    p = points.withColumn("__bin", _bin(point_col, bin_width))
    i = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(_bin(lo_col, bin_width),
                             _bin(hi_col, bin_width))),
    )
    cond = p["__bin"] == i["__bin"]
    for k in on:
        cond &= p[k] == i[k]
    cond &= (p[point_col] >= i[lo_col]) & (p[point_col] <= i[hi_col])
    joined = p.join(i, cond, "inner" if how == "inner" else "left_outer")
    # drop the bin keys and de-duplicate `on` columns (keep point side)
    out_cols = [p[c] for c in points.columns] + \
        [i[c] for c in intervals.columns if c not in on]
    return joined.select(*out_cols)
