"""As-of join — an operator Spark lacks natively.

Implemented as the union + last-non-null-window composition (not a
range join): tag right-side rows, union with the left, sort within each
key partition by (time, side-priority), and carry the right side's
values forward with ``last(..., ignorenulls=True)``. One shuffle on the
join key, linear work — the classic scalable as-of, vs. the
O(left × right) explosion of a naive range join.

Tie semantics are inclusive (right row at exactly t matches a left row
at t), matching DuckDB's ``ASOF JOIN`` (``ON l.t >= r.t``), which the
workload uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with ``right_time <= left_time`` (direction="backward") or the
    earliest right row with ``right_time >= left_time``
    (direction="forward"), per ``on`` key. Right columns come back
    suffixed ``_asof``. Both directions are the same one-shuffle union +
    carry-window composition — forward just orders time descending so
    "carry last non-null" means "nearest following".
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")

    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}_asof")
          for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c != on else F.col(on) for c in lcols],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}_asof") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal time → inclusive match;
    # value columns break ties among right rows sharing (key, time) so
    # the carried value is deterministic (largest wins) instead of
    # partition-order-dependent. Forward direction reverses the time
    # ordering only — the carry logic is identical.
    time_key = F.col("_t") if direction == "backward" else F.col("_t").desc()
    w = (W.partitionBy(on)
         .orderBy(time_key, "_is_left", *[f"{c}_asof" for c in value_cols])
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = unioned.select(
        *lcols, "_is_left",
        *[F.last(f"{c}_asof", ignorenulls=True).over(w).alias(f"{c}_asof")
          for c in value_cols],
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")
