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


class TestClusterRepresentativesQualityJoin:
    """Round-10 ADVICE: quality is LEFT-joined — members without a
    quality row still count toward n_members, all-unscored clusters
    are still emitted, and scored members always outrank unscored."""

    def _pairs(self, spark):
        return spark.createDataFrame(
            [(1, 2), (3, 4)], "id1 long, id2 long")

    def test_missing_quality_member_still_counted(self, spark):
        from db2pq_spark.operators.components import (
            cluster_representatives)

        # cluster {1,2}: only 2 is scored; cluster {3,4}: no scores
        quality = spark.createDataFrame([(2, 0.1)],
                                        "doc_id long, q double")
        got = {r["comp"]: r for r in cluster_representatives(
            self._pairs(spark), quality, "doc_id", "q").collect()}
        assert got[1]["n_members"] == 2
        # scored member wins even with a low score
        assert got[1]["rep_id"] == 2 and got[1]["rep_quality"] == 0.1
        # fully-unscored cluster is emitted: lowest id, null quality
        assert got[3]["n_members"] == 2
        assert got[3]["rep_id"] == 3 and got[3]["rep_quality"] is None

    def test_full_coverage_unchanged(self, spark):
        from db2pq_spark.operators.components import (
            cluster_representatives)

        quality = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.7), (4, 0.7)],
            "doc_id long, q double")
        got = {r["comp"]: r for r in cluster_representatives(
            self._pairs(spark), quality, "doc_id", "q").collect()}
        assert got[1]["rep_id"] == 2 and got[1]["rep_quality"] == 0.9
        # tie on quality -> lower id
        assert got[3]["rep_id"] == 3 and got[3]["n_members"] == 2

    def test_non_numeric_id_raises(self, spark):
        from db2pq_spark.operators.components import (
            cluster_representatives)

        pairs = spark.createDataFrame([("a", "b")],
                                      "id1 string, id2 string")
        quality = spark.createDataFrame([("a", 1.0)],
                                        "doc_id string, q double")
        with pytest.raises(TypeError, match="numeric id"):
            cluster_representatives(pairs, quality, "doc_id", "q")


class TestMmrGuards:
    """Round-10 ADVICE + verdict item 7: zero-norm vectors poison the
    NaN-sorts-first argmax; O(k·d) literal inlining needs a k cap."""

    def test_zero_norm_candidate_never_selected(self, spark):
        from db2pq_spark.operators.mmr import mmr_select

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>")
        got = mmr_select(df, "embedding", "vec_id",
                         [1.0, 0.0], k=3).collect()
        assert [r["id"] for r in got] == [2, 3]  # 1 filtered out

    def test_zero_norm_query_raises(self, spark):
        from db2pq_spark.operators.mmr import mmr_select

        df = spark.createDataFrame([(1, [1.0, 0.0])],
                                   "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="zero norm"):
            mmr_select(df, "embedding", "vec_id", [0.0, 0.0], k=1)

    def test_k_cap_raises(self, spark):
        from db2pq_spark.operators.mmr import MMR_MAX_K, mmr_select

        df = spark.createDataFrame([(1, [1.0, 0.0])],
                                   "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="MMR_MAX_K"):
            mmr_select(df, "embedding", "vec_id", [1.0, 0.0],
                       k=MMR_MAX_K + 1)


class TestPcaProjectEmpty:
    def test_empty_relation_clean_error(self, spark):
        from db2pq_spark.operators.pca import pca_project

        df = spark.createDataFrame(
            [], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="empty relation"):
            pca_project(df, "embedding", "vec_id", k=1)


class TestWinnowCrossFamilyParity:
    """Round-10 ADVICE: the arrow64 numpy kernel (the round-9 default)
    must find the same overlap PAIR SET as the all-JVM xxhash64
    expression form. Fingerprint VALUES differ by design (disjoint
    hash families) and partial overlaps below the w+k-1 guarantee may
    legitimately surface under one family only, so the corpus here has
    only guaranteed-run overlaps (>= w+k-1 shared tokens) or zero
    shared k-grams — on such corpora the pair sets must be equal."""

    def test_same_overlap_pairs(self, spark):
        from db2pq_spark.operators.dedup import winnow_overlap_pairs

        df = spark.createDataFrame([
            (1, "alpha beta gamma delta epsilon zeta eta theta iota x"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota y"),
            (3, "one two three four five six seven eight nine ten"),
            (4, "pre amble one two three four five six seven eight nine"),
            (5, "totally unrelated words that never overlap anything"),
        ], "doc_id long, text string")

        def pairs(fam):
            return {(r["id1"], r["id2"])
                    for r in winnow_overlap_pairs(
                        df, "text", "doc_id", k=3, w=4, min_shared=1,
                        token_hash=fam).collect()}

        arrow, jvm = pairs("arrow64"), pairs("xxhash64")
        assert arrow == jvm
        assert {(1, 2), (3, 4)} <= arrow
        assert not any(5 in p for p in arrow)
