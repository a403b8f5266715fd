"""Slowly-changing-dimension (SCD type 2) merge — MERGE INTO emulation.

Plain-parquet engines (this one, like the reference) have no
transactional MERGE; the SCD2 pattern composes it from set operations:

- rows of ``current`` whose key gets a *changed* update are **closed**
  (``valid_to`` = update effective time),
- every changed/new update row is **opened** as the fresh version
  (``valid_to`` = NULL),
- everything else passes through untouched.

One equi-join on the business key + unions — at scale this is a single
shuffle on the key (the update side is usually broadcast-size). The
write side pairs with the repository's atomic promote for a
read-consistent swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply SCD2 updates to a versioned dimension.

    ``current`` columns: key, attrs, valid_from, valid_to (NULL = open).
    ``updates`` columns: key, attrs, effective_col — at most one row per
    key (pre-aggregate to latest-per-key upstream otherwise). Returns
    the full new dimension with history preserved."""
    cols = [key, *attrs, valid_from, valid_to]
    # disambiguate by renaming the update side once, up front
    upd = updates.select(
        F.col(key).alias("_u_key"),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(effective_col).alias("_u_eff"),
    )

    open_rows = current.filter(F.col(valid_to).isNull())
    closed_rows = current.filter(F.col(valid_to).isNotNull()).select(*cols)

    joined = open_rows.join(upd, F.col(key) == F.col("_u_key"), "left")
    same = F.struct(*[F.col(a) for a in attrs]) == \
        F.struct(*[F.col(f"_u_{a}") for a in attrs])

    unchanged_open = joined.filter(F.col("_u_key").isNull() | same) \
                           .select(*cols)
    closed_now = joined.filter(F.col("_u_key").isNotNull() & ~same).select(
        F.col(key), *[F.col(a) for a in attrs], F.col(valid_from),
        F.col("_u_eff").alias(valid_to),
    )

    open_keys = open_rows.select(F.col(key).alias("_e_key"))
    changed_keys = joined.filter(F.col("_u_key").isNotNull() & ~same) \
                         .select(F.col("_u_key").alias("_c_key")).distinct()
    fresh = (
        upd.join(changed_keys, F.col("_u_key") == F.col("_c_key"), "left")
        .join(open_keys, F.col("_u_key") == F.col("_e_key"), "left")
        .filter(F.col("_c_key").isNotNull() | F.col("_e_key").isNull())
        .select(
            F.col("_u_key").alias(key),
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.col("_u_eff").alias(valid_from),
            F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to),
        )
    )

    return (
        closed_rows
        .unionByName(unchanged_open)
        .unionByName(closed_now)
        .unionByName(fresh)
    )
