"""Progress reporter: bar renders during a real action when forced,
stays silent on non-TTY output by default (reference Q3 semantics)."""

from __future__ import annotations

import io

from db2pq_spark.progress import with_progress


def test_progress_renders_when_forced(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    buf = io.StringIO()
    # a multi-stage action slow enough to catch at least one poll
    n = with_progress(
        spark,
        lambda: li.repartition(64, "l_orderkey")
                  .groupBy("l_orderkey").count().count(),
        force=True, out=buf,
    )
    assert n > 0
    text = buf.getvalue()
    assert "tasks" in text and "eta" in text


def test_progress_silent_on_non_tty(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    buf = io.StringIO()  # not a TTY → disabled
    n = with_progress(spark, lambda: li.count(), out=buf)
    assert n > 0 and buf.getvalue() == ""
