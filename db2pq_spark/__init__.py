"""db2pq_spark — a PySpark-native database-to-Parquet ETL + analytics engine.

A from-scratch reimplementation of the *capabilities* of iangow/db2pq
(reference surveyed in SURVEY.md) on Apache Spark:

- JDBC/Parquet sources with planned projection/rename/cast/filter/limit
  pushdown (reference: db2pq/postgres/select_sql.py, duckdb_pg.py, adbc.py)
- Parquet repository sink with atomic temp-file promotion, archive /
  restore / remove lifecycle, and ``last_modified`` freshness metadata
  (reference: db2pq/files/parquet.py, db2pq/files/paths.py)
- Freshness-comparison sync kernel (reference: db2pq/sync/modified.py)
- Full relational query surface via Spark SQL / DataFrame (the reference
  delegates this to DuckDB/PostgreSQL; here Catalyst executes it natively)
- Large-scale data-pipeline extensions: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  text analysis, multimodal column plumbing, streaming windows.

Architecture is Spark-first: every operator is a declarative DataFrame
plan optimized by Catalyst; Python UDFs appear only as Arrow-batched
Pandas UDFs and only where built-ins cannot express the semantics.
"""

from __future__ import annotations

__version__ = "0.1.0"

from db2pq_spark.session import get_spark  # noqa: F401
from db2pq_spark.plans.plan import QueryPlan, build_plan, filter_columns  # noqa: F401
from db2pq_spark.types import normalize_col_types, spark_type_for  # noqa: F401


def __getattr__(name: str):
    """Reference-shaped module-level API (``import db2pq_spark as db2pq;
    db2pq.db_to_pq(...)``) — lazily resolved from :mod:`.compat` so that
    importing the package never triggers SparkSession construction
    (mirrors the reference's lazy exports, db2pq/__init__.py:19-28)."""
    import importlib

    compat = importlib.import_module("db2pq_spark.compat")
    if name == "compat":
        return compat
    if name in compat.PUBLIC_EXPORTS:
        return getattr(compat, name)
    raise AttributeError(f"module 'db2pq_spark' has no attribute {name!r}")
