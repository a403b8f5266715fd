"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke check);
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB-oracle correctness gate at sf0.01.

All real logic lives in the ``db2pq_spark`` package; this file is the
thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from db2pq_spark import workload

    return workload.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from db2pq_spark import workload

    return workload.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    from db2pq_spark import workload

    return workload.oracles()
