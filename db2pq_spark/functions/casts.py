"""Numeric-mode handling for NUMERIC/decimal columns.

The reference supports three user modes for source NUMERIC columns
(db2pq/core.py:8-15 ``_resolve_numeric_mode``; applied in
db2pq/postgres/duckdb_pg.py:80-105 and db2pq/postgres/adbc.py:55-79):

- ``"decimal"`` — keep native decimal (``DecimalType(p, s)``; precision
  39-76 → string, Spark has no decimal256 — documented deviation, see
  db2pq/files/parquet.py:160-200 for the reference's decimal256 path)
- ``"float64"`` — cast to double
- ``"text"`` — cast to string
- ``None`` — default: decimal (the reference's DuckDB-engine default)

``apply_numeric_mode`` plans the casts: given the introspected
``(precision, scale)`` per decimal column, it merges the mode default
with explicit ``col_types`` overrides (explicit wins — reference
db2pq/postgres/duckdb_pg.py:95-99) and returns the cast DataFrame.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from db2pq_spark.types import MAX_DECIMAL_PRECISION

NumericMode = str | None

_VALID_MODES = {None, "decimal", "float64", "text"}


def resolve_numeric_mode(mode: NumericMode) -> str:
    """Validate and default the numeric mode (reference db2pq/core.py:8-15)."""
    if mode not in _VALID_MODES:
        raise ValueError(
            f"numeric_mode must be one of decimal/float64/text, got {mode!r}"
        )
    return mode or "decimal"


def decimal_columns(df: DataFrame) -> dict[str, tuple[int, int]]:
    """Introspect decimal columns → {name: (precision, scale)}.

    The Spark analogue of the reference's information_schema numeric-
    bounds introspection (db2pq/postgres/introspect.py:30-53) — the
    schema is already typed, so bounds come from the DataFrame itself.
    """
    out: dict[str, tuple[int, int]] = {}
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.DecimalType):
            out[f_.name] = (f_.dataType.precision, f_.dataType.scale)
    return out


def apply_numeric_mode(
    df: DataFrame,
    mode: NumericMode = None,
    explicit: Mapping[str, str] | None = None,
) -> DataFrame:
    """Cast decimal columns per the numeric mode.

    Columns named in ``explicit`` (user col_types) are left for the plan's
    own cast step — mode defaults never override explicit types
    (reference: db2pq/postgres/duckdb_pg.py:95-99).
    """
    mode = resolve_numeric_mode(mode)
    explicit = set(explicit or ())
    decs = {c: ps for c, ps in decimal_columns(df).items() if c not in explicit}
    if not decs:
        return df
    exprs = []
    for c in df.columns:
        if c not in decs:
            exprs.append(F.col(c))
        elif mode == "float64":
            exprs.append(F.col(c).cast("double").alias(c))
        elif mode == "text":
            exprs.append(F.col(c).cast("string").alias(c))
        else:  # decimal: keep, unless precision exceeds Spark's max
            p, _s = decs[c]
            if p > MAX_DECIMAL_PRECISION:
                exprs.append(F.col(c).cast("string").alias(c))
            else:
                exprs.append(F.col(c))
    return df.select(*exprs)
