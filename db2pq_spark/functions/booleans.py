"""Safe boolean coercion.

WRDS-style sources encode booleans as text/numeric; the reference maps a
truthy/falsy vocabulary through a CASE expression and NULLs everything
else (db2pq/postgres/select_sql.py:55-65). Here it is a single Catalyst
expression — whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRUTHY = ("t", "true", "y", "yes", "1", "1.0")
FALSY = ("f", "false", "n", "no", "0", "0.0")


def safe_boolean(col: Column | str) -> Column:
    """Map text/numeric truthy/falsy encodings to boolean, else NULL."""
    c = F.lower(F.trim(F.col(col).cast("string"))) if isinstance(col, str) else \
        F.lower(F.trim(col.cast("string")))
    return (
        F.when(c.isin(*TRUTHY), F.lit(True))
        .when(c.isin(*FALSY), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
