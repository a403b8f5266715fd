"""Opt-in memory-regression probe (reference parity: the opt-in RSS
bound test at tests/test_local_postgres.py:915-964 — RSS growth ≤
200 MB over repeated exports).

Run with ``DB2PQ_SPARK_MEMPROBE=1 python -m pytest
tests/test_memory_probe.py``. Skipped by default: peak-RSS assertions
are load-sensitive and belong in a quiet environment, exactly like the
reference's opt-in marker.
"""

from __future__ import annotations

import os
import resource

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("DB2PQ_SPARK_MEMPROBE"),
    reason="opt-in: set DB2PQ_SPARK_MEMPROBE=1",
)


def _peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def test_repeated_exports_do_not_grow_driver_rss(spark, sf_dir, tmp_path):
    """Driver-side Python RSS must plateau across repeated exports —
    the write path streams through the JVM; Python only orchestrates.
    (The JVM heap is bounded separately by spark.driver.memory.)"""
    from db2pq_spark.core import Engine

    eng = Engine(spark, tmp_path)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # warm-up establishes the plateau (codegen, Py4J, page cache)
    for i in range(2):
        eng.df_to_pq(li, "probe", f"warm{i}",
                     last_modified="Last modified: 01/01/2026 00:00:00")
    baseline = _peak_rss_mb()

    for i in range(3):
        eng.df_to_pq(li, "probe", f"iter{i}",
                     last_modified="Last modified: 01/01/2026 00:00:00")
    growth = _peak_rss_mb() - baseline
    assert growth <= 200, f"driver RSS grew {growth:.0f} MB (> 200 MB)"
