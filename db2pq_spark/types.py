"""Type-alias normalization and Spark type resolution.

Capability parity with the reference's canonical type-alias table
(reference: db2pq/types.py:4-90 — user-facing aliases → canonical names →
engine spellings). Here the single engine is Spark, so the mapping is
alias → canonical → ``pyspark.sql.types.DataType``.

Decimal support: ``decimal(p, s)`` strings are parsed; precision ≤ 38 maps
to ``DecimalType(p, s)``. Precision 39-76 (the reference's decimal256,
db2pq/files/parquet.py:164-166) has no Spark representation — those
columns are kept as strings and flagged via :func:`is_overflow_decimal`.
"""

from __future__ import annotations

import re
from typing import Mapping

from pyspark.sql import types as T

from db2pq_spark.errors import UnknownTypeError

# user alias → canonical name
_ALIASES: dict[str, str] = {
    # boolean
    "bool": "boolean",
    "boolean": "boolean",
    # integers
    "int2": "int16",
    "int16": "int16",
    "smallint": "int16",
    "short": "int16",
    "int": "int32",
    "int4": "int32",
    "int32": "int32",
    "integer": "int32",
    "int8": "int64",
    "int64": "int64",
    "bigint": "int64",
    "long": "int64",
    # floats
    "float": "float32",
    "float4": "float32",
    "float32": "float32",
    "real": "float32",
    "double": "float64",
    "float8": "float64",
    "float64": "float64",
    "double precision": "float64",
    # strings
    "str": "string",
    "string": "string",
    "text": "string",
    "varchar": "string",
    "utf8": "string",
    # temporal
    "date": "date",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "timestamptz": "timestamp",
    "timestamp with time zone": "timestamp",
    "timestamp without time zone": "timestamp",
    # binary
    "binary": "binary",
    "bytea": "binary",
    "bytes": "binary",
    "blob": "binary",
}

_CANONICAL_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}

_DECIMAL_RE = re.compile(
    r"^\s*(?:decimal|numeric)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*$",
    re.IGNORECASE,
)

#: Spark's maximum decimal precision. The reference transports wider
#: NUMERICs as decimal256 (p ≤ 76); we keep those as strings.
MAX_DECIMAL_PRECISION = 38


def canonical_type(alias: str) -> str:
    """Normalize a user-facing type alias to its canonical name.

    ``decimal(p,s)`` / ``numeric(p,s)`` pass through normalized to
    ``decimal(p,s)`` lowercase spelling. Unknown aliases raise
    :class:`UnknownTypeError`.
    """
    key = str(alias).strip().lower()
    if key in _ALIASES:
        return _ALIASES[key]
    m = _DECIMAL_RE.match(key)
    if m:
        p = int(m.group(1)) if m.group(1) else 38
        s = int(m.group(2)) if m.group(2) else (18 if not m.group(1) else 0)
        return f"decimal({p},{s})"
    raise UnknownTypeError(f"unknown type alias: {alias!r}")


def is_overflow_decimal(canonical: str) -> bool:
    """True when a canonical decimal exceeds Spark's 38-digit precision."""
    m = _DECIMAL_RE.match(canonical)
    return bool(m and m.group(1) and int(m.group(1)) > MAX_DECIMAL_PRECISION)


def spark_type_for(alias: str) -> T.DataType:
    """Resolve a user alias (or canonical name) to a Spark DataType.

    Decimals beyond precision 38 degrade to ``StringType`` (documented
    deviation — Spark has no decimal256).
    """
    canon = canonical_type(alias)
    if canon in _CANONICAL_SPARK:
        return _CANONICAL_SPARK[canon]
    m = _DECIMAL_RE.match(canon)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        if p > MAX_DECIMAL_PRECISION:
            return T.StringType()
        return T.DecimalType(p, s)
    raise UnknownTypeError(f"unknown type alias: {alias!r}")  # pragma: no cover


def normalize_col_types(col_types: Mapping[str, str] | None) -> dict[str, str]:
    """Normalize a user ``col_types`` mapping to canonical names.

    Mirrors the reference's normalization step (db2pq/types.py:70-90):
    every value must resolve; unknown aliases raise with the offending
    column named.
    """
    if not col_types:
        return {}
    out: dict[str, str] = {}
    for col, alias in col_types.items():
        try:
            out[col] = canonical_type(alias)
        except UnknownTypeError:
            raise UnknownTypeError(
                f"unknown type {alias!r} for column {col!r}"
            ) from None
    return out
