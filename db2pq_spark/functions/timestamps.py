"""Timestamp normalization.

The reference interprets naive ``timestamp without time zone`` values in
a user-supplied timezone and emits tz-aware UTC (two implementations:
Arrow-side ``assume_timezone`` + cast, db2pq/files/parquet.py:122-157,
and SQL-side ``AT TIME ZONE``, db2pq/postgres/select_sql.py:138-140).

Spark gives us one implementation: ``to_utc_timestamp`` plus a UTC
session timezone. With ``spark.sql.session.timeZone=UTC`` every
TimestampType value is already UTC-instant semantics, so normalization is
only needed when the naive source values mean some *other* zone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def to_utc(col: Column | str, tz: str = "UTC") -> Column:
    """Interpret a naive timestamp column as ``tz``-local, return UTC."""
    c = F.col(col) if isinstance(col, str) else col
    if tz in ("UTC", "Etc/UTC", "GMT"):
        return c.cast("timestamp")
    return F.to_utc_timestamp(c.cast("timestamp"), tz)


def normalize_timestamps(df: DataFrame, tz: str = "UTC") -> DataFrame:
    """Normalize every timestamp column to UTC-instant semantics.

    Mirrors the reference's whole-table pass
    (db2pq/files/parquet.py:202-219) as a single projection.
    """
    if tz in ("UTC", "Etc/UTC", "GMT"):
        return df
    ts_cols = {f.name for f in df.schema.fields
               if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))}
    if not ts_cols:
        return df
    return df.select(
        *[to_utc(F.col(c), tz).alias(c) if c in ts_cols else F.col(c)
          for c in df.columns]
    )
