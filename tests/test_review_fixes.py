"""Regression tests for the code-review findings: crash-safe promote,
zero-row detection without double execution, LIMIT×partitioned-read
guard, salted-join type restriction, NULL multimodal payloads,
deterministic as-of ties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db2pq_spark.operators.asof import asof_join
from db2pq_spark.operators.multimodal import extract_features
from db2pq_spark.operators.skew import salted_join
from db2pq_spark.plans.plan import build_plan
from db2pq_spark.sinks.parquet_sink import table_path, write_parquet
from db2pq_spark.sources.jdbc import JdbcSource, jdbc_read_options

SRC = JdbcSource(url="jdbc:postgresql://h:5432/db")


class TestJdbcGuards:
    def test_partitioned_read_requires_bounds(self):
        with pytest.raises(ValueError, match="bounds"):
            jdbc_read_options(SRC, schema="s", table="t",
                              partition_column="id")

    def test_limit_rejected_with_partitioning(self):
        plan = build_plan(["id", "v"], obs=100)
        with pytest.raises(ValueError, match="LIMIT"):
            jdbc_read_options(SRC, plan=plan, schema="s", table="t",
                              partition_column="id",
                              lower_bound=0, upper_bound=10)


class TestSaltedJoinGuard:
    def test_right_and_full_rejected(self, spark):
        df = spark.range(3).withColumnRenamed("id", "k")
        for how in ("right", "full", "full_outer"):
            with pytest.raises(ValueError, match="salted_join supports"):
                salted_join(df, df, "k", how=how)


class TestSinkSafety:
    def test_zero_rows_after_real_write(self, spark, sf_dir, tmp_path):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        out = write_parquet(li.filter("l_quantity < 0"), tmp_path, "s", "t")
        assert out is None
        assert not table_path(tmp_path, "s", "t").exists()
        # no stray temp/parked dirs either
        assert list((tmp_path / "s").glob(".*")) == []

    def test_overwrite_leaves_no_parked_dir(self, spark, sf_dir, tmp_path):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_parquet(li.limit(10), tmp_path, "s", "t")
        write_parquet(li.limit(20), tmp_path, "s", "t")
        assert spark.read.parquet(
            str(table_path(tmp_path, "s", "t"))).count() == 20
        assert list((tmp_path / "s").glob(".old_*")) == []


class TestMultimodalNulls:
    def test_null_payload_yields_null_features(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"abc")), (2, None)],
            "doc_id long, content binary")
        rows = {r["doc_id"]: r for r in extract_features(df).collect()}
        assert rows[1]["n_bytes"] == 3
        assert rows[2]["n_bytes"] is None
        assert rows[2]["sha256"] is None


class TestAsofTies:
    def test_equal_timestamp_right_rows_resolve_deterministically(self, spark):
        left = spark.createDataFrame([(1, 10, 1000)],
                                     "event_id long, user_id long, ts_us long")
        right = spark.createDataFrame(
            [(10, 1000, 5.0), (10, 1000, 9.0)],
            "user_id long, ts_us long, score double")
        outs = {
            asof_join(left, right.repartition(p), "user_id",
                      "ts_us", "ts_us", ["score"]).collect()[0]["score_asof"]
            for p in (1, 2, 7)
        }
        assert outs == {9.0}  # largest value wins, every partitioning
