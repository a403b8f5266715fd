"""Progress reporter: bar renders during a real action when forced,
stays silent on non-TTY output by default (reference Q3 semantics)."""

from __future__ import annotations

import io

from db2pq_spark.progress import with_progress


def test_progress_renders_when_forced(spark, sf_dir):
    import time

    from pyspark.sql import functions as F

    buf = io.StringIO()

    @F.udf("long")
    def slow(x):
        time.sleep(0.002)
        return x

    # deterministically slow (~1 s of in-stage time across 4 tasks) so
    # the 0.25 s poll is guaranteed to land inside an active stage even
    # on a loaded machine. The aggregate CONSUMES the UDF column —
    # count() would let Catalyst prune the UDF and finish instantly.
    df = spark.range(2000).repartition(4).select(slow("id").alias("v"))
    n = with_progress(
        spark,
        lambda: df.agg(F.count("v")).first()[0],
        force=True, out=buf,
    )
    assert n == 2000
    text = buf.getvalue()
    assert "tasks" in text and "eta" in text


def test_progress_silent_on_non_tty(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    buf = io.StringIO()  # not a TTY → disabled
    n = with_progress(spark, lambda: li.count(), out=buf)
    assert n > 0 and buf.getvalue() == ""
