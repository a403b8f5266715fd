"""Scale-path features: hive-partitioned exports (with partition
pruning), salted joins (result parity with plain joins), vectorized
pandas cosine (parity with the JVM fold)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db2pq_spark.core import Engine
from db2pq_spark.operators.similarity import cosine_topk, cosine_topk_pandas
from db2pq_spark.operators.skew import salted_join


class TestPartitionedExport:
    def test_layout_and_pruning(self, spark, sf_dir, tmp_path):
        eng = Engine(spark, tmp_path)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        path = eng.df_to_pq(li, "sf", "li_part", partition_by=["l_returnflag"])
        subdirs = {p.name for p in path.iterdir() if p.is_dir()}
        assert {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"} <= subdirs

        back = spark.read.parquet(str(path))
        assert back.count() == li.count()
        # partition pruning must reach the scan
        q = back.filter(F.col("l_returnflag") == "R")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(l_returnflag" in plan
        assert q.count() == li.filter("l_returnflag = 'R'").count()

    def test_partition_by_excludes_single_file(self, spark, sf_dir, tmp_path):
        eng = Engine(spark, tmp_path, single_file=True)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        with pytest.raises(ValueError, match="mutually exclusive"):
            eng.df_to_pq(li, "sf", "bad", partition_by=["l_returnflag"])


class TestSaltedJoin:
    def test_same_result_as_plain_join(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
            .select(F.col("l_suppkey").alias("s_suppkey"), "l_quantity")
        s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        plain = (li.join(s, "s_suppkey")
                 .groupBy("s_suppkey").agg(F.count("*").alias("n")))
        salted = (salted_join(li, s, "s_suppkey", salt=8)
                  .groupBy("s_suppkey").agg(F.count("*").alias("n")))
        assert sorted(map(tuple, plain.collect())) == \
            sorted(map(tuple, salted.collect()))


class TestPandasCosine:
    def test_matches_jvm_fold(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        jvm = {(r["query_id"], r["rank"]): r["neighbor_id"]
               for r in cosine_topk(emb, q, k=5).collect()}
        pnd = {(r["query_id"], r["rank"]): r["neighbor_id"]
               for r in cosine_topk_pandas(emb, q, k=5).collect()}
        assert jvm == pnd
