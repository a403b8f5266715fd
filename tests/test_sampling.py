"""Deterministic sampling/split operators: reproducibility, proportions,
stratified quotas, and the no-shuffle plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db2pq_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    split_assign,
    stratified_sample,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").cache()


class TestDeterminism:
    def test_same_rows_every_run(self, orders):
        a = sorted(r.o_orderkey for r in
                   deterministic_sample(orders, "o_orderkey", 0.2).collect())
        b = sorted(r.o_orderkey for r in
                   deterministic_sample(orders, "o_orderkey", 0.2).collect())
        assert a == b and len(a) > 0

    def test_stable_under_repartitioning(self, orders):
        base = sorted(r.o_orderkey for r in
                      deterministic_sample(orders, "o_orderkey", 0.3).collect())
        rep = sorted(
            r.o_orderkey for r in
            deterministic_sample(orders.repartition(7), "o_orderkey", 0.3)
            .collect())
        assert base == rep

    def test_growing_the_table_keeps_old_decisions(self, orders):
        half = orders.where(F.col("o_orderkey") % 2 == 0)
        sampled_half = set(r.o_orderkey for r in
                           deterministic_sample(half, "o_orderkey", 0.5)
                           .collect())
        sampled_full = set(r.o_orderkey for r in
                           deterministic_sample(orders, "o_orderkey", 0.5)
                           .collect())
        # every row sampled from the smaller table is still sampled later
        assert sampled_half == {k for k in sampled_full if k % 2 == 0}

    def test_salt_decorrelates(self, orders):
        a = set(r.o_orderkey for r in
                deterministic_sample(orders, "o_orderkey", 0.5, salt="a")
                .collect())
        b = set(r.o_orderkey for r in
                deterministic_sample(orders, "o_orderkey", 0.5, salt="b")
                .collect())
        n = orders.count()
        overlap = len(a & b) / n
        # independent 50% samples overlap ~25%, not ~50%
        assert 0.15 < overlap < 0.35


class TestProportions:
    def test_fraction_is_approximate(self, orders):
        n = orders.count()
        k = deterministic_sample(orders, "o_orderkey", 0.25).count()
        assert abs(k / n - 0.25) < 0.05

    def test_split_partitions_everything(self, orders):
        df = split_assign(orders, "o_orderkey",
                          {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  df.groupBy("split").agg(F.count("*").alias("n")).collect()}
        n = orders.count()
        assert sum(counts.values()) == n  # no row unassigned
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / n - 0.8) < 0.05

    def test_splits_are_disjoint_by_construction(self, orders):
        df = split_assign(orders, "o_orderkey", {"a": 1, "b": 1})
        assert df.groupBy("o_orderkey").agg(
            F.countDistinct("split").alias("k")).where("k > 1").count() == 0


class TestStratified:
    def test_quotas_per_stratum(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = stratified_sample(docs, "doc_id", "lang",
                                {"en": 0.5, "de": 0.25})
        got = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        base = {r["lang"]: r["n"] for r in
                docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert set(got) <= {"en", "de"}  # unlisted strata dropped
        assert abs(got["en"] / base["en"] - 0.5) < 0.15
        assert abs(got.get("de", 0) / base["de"] - 0.25) < 0.15

    def test_bad_fraction_rejected(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        with pytest.raises(ValueError):
            stratified_sample(docs, "doc_id", "lang", {"en": 1.5})


class TestPlanShape:
    def test_sampling_is_narrow(self, orders):
        """The whole point at 100 TB: sampling must not shuffle."""
        df = deterministic_sample(orders, "o_orderkey", 0.1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_split_assign_is_narrow(self, orders):
        df = split_assign(orders, "o_orderkey", {"train": 0.9, "test": 0.1})
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_bucket_range(self, orders):
        stats = (orders.select(hash_bucket("o_orderkey", 1000))
                 .agg(F.min("bucket"), F.max("bucket")).first())
        assert stats[0] >= 0 and stats[1] < 1000


class TestWeightedSample:
    def _mk(self, spark):
        rows = [(i, 1000.0 if i < 1000 else 1.0) for i in range(2000)]
        return spark.createDataFrame(rows, "id long, w double")

    def test_heavy_weights_dominate(self, spark):
        from db2pq_spark.operators.sampling import weighted_sample

        df = self._mk(spark)
        got = weighted_sample(df, "id", "w", 100).collect()
        heavy = sum(1 for r in got if r["w"] == 1000.0)
        assert len(got) == 100
        assert heavy >= 95          # P(light row beats heavy) ~ w ratio

    def test_deterministic_under_repartition(self, spark):
        from db2pq_spark.operators.sampling import weighted_sample

        df = self._mk(spark)
        a = {r["id"] for r in weighted_sample(df, "id", "w", 50).collect()}
        b = {r["id"] for r in
             weighted_sample(df.repartition(17), "id", "w", 50).collect()}
        assert a == b

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from db2pq_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
            "id long, w double")
        got = sorted(r["id"] for r in
                     weighted_sample(df, "id", "w", 10).collect())
        assert got == [1, 5]        # n > eligible rows -> all eligible

    def test_plan_is_topk_not_full_sort(self, spark):
        from db2pq_spark.operators.sampling import weighted_sample

        df = self._mk(spark)
        plan = weighted_sample(df, "id", "w", 10) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_bad_n_rejected(self, spark):
        from db2pq_spark.operators.sampling import weighted_sample

        with pytest.raises(ValueError):
            weighted_sample(self._mk(spark), "id", "w", 0)


class TestDeterministicShuffle:
    def _mk(self, spark):
        return spark.createDataFrame(
            [(i,) for i in range(200)], "id long")

    def test_is_a_permutation(self, spark):
        from db2pq_spark.operators.sampling import deterministic_shuffle

        out = deterministic_shuffle(self._mk(spark), "id", seed="s")
        orders = sorted(r["shuffle_order"] for r in out.collect())
        assert orders == list(range(1, 201))

    def test_reproducible_and_partition_independent(self, spark):
        from db2pq_spark.operators.sampling import deterministic_shuffle

        df = self._mk(spark)
        a = {r["id"]: r["shuffle_order"]
             for r in deterministic_shuffle(df, "id", seed="s").collect()}
        b = {r["id"]: r["shuffle_order"]
             for r in deterministic_shuffle(
                 df.repartition(13), "id", seed="s").collect()}
        assert a == b

    def test_null_key_raises(self, spark):
        """NULL keys would null-propagate through md5 and break the
        total order (partition-dependent positions) — they must fail
        loudly instead."""
        from db2pq_spark.operators.sampling import deterministic_shuffle

        df = spark.createDataFrame([(1,), (None,), (3,)], "id long")
        with pytest.raises(Exception, match="NULL in key column"):
            deterministic_shuffle(df, "id", seed="s").collect()

    def test_seeds_give_different_permutations(self, spark):
        from db2pq_spark.operators.sampling import deterministic_shuffle

        df = self._mk(spark)
        a = {r["id"]: r["shuffle_order"]
             for r in deterministic_shuffle(df, "id", seed="e0").collect()}
        b = {r["id"]: r["shuffle_order"]
             for r in deterministic_shuffle(df, "id", seed="e1").collect()}
        assert a != b            # astronomically unlikely to collide
        # and visibly decorrelated from the key order
        assert [a[i] for i in range(200)] != list(range(1, 201))

    def test_no_single_partition_stage(self, spark):
        from db2pq_spark.operators.sampling import deterministic_shuffle

        plan = deterministic_shuffle(self._mk(spark), "id", seed="s") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
