"""Count-min sketch, ROC-AUC, and MI feature selection."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _docs(spark):
    rows = [(1, "apple apple banana", 1), (2, "apple cherry", 1),
            (3, "dog dog dog cat", 0), (4, "cat dog fish", 0)]
    return spark.createDataFrame(rows, "id long, text string, y int")


class TestCms:
    def test_estimate_upper_bounds_exact(self, spark):
        from db2pq_spark.operators.cms import cms_build, cms_probe

        docs = _docs(spark)
        sk = cms_build(docs, "text", depth=3, width=64)
        probes = spark.createDataFrame(
            [("apple",), ("dog",), ("unseen",)], "tok string")
        got = {r["tok"]: r["est"]
               for r in cms_probe(sk, probes, depth=3,
                                  width=64).collect()}
        assert got["apple"] >= 3 and got["dog"] >= 4
        # width 64 over ~6 distinct tokens: collisions possible but
        # the unseen token can only read collision mass
        assert got["unseen"] >= 0

    def test_tiny_width_overcounts(self, spark):
        from db2pq_spark.operators.cms import cms_build, cms_probe

        docs = _docs(spark)
        sk = cms_build(docs, "text", depth=1, width=2)
        probes = spark.createDataFrame([("apple",)], "tok string")
        est = cms_probe(sk, probes, depth=1, width=2).collect()[0]["est"]
        assert est >= 3  # everything hashed into 2 cells

    def test_merge_equals_union_build(self, spark):
        from db2pq_spark.operators.cms import cms_build, cms_merge

        docs = _docs(spark)
        merged = cms_merge(
            cms_build(docs.where("id <= 2"), "text", depth=2, width=32),
            cms_build(docs.where("id > 2"), "text", depth=2, width=32),
            depth=2, width=32)
        direct = cms_build(docs, "text", depth=2, width=32)
        a = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
        b = {(r["row"], r["col"]): r["cnt"] for r in direct.collect()}
        assert a == b

    def test_geometry_stamp_mismatch_raises(self, spark):
        from db2pq_spark.operators.cms import (
            cms_build, cms_merge, cms_probe)

        docs = _docs(spark)
        sk = cms_build(docs, "text", depth=2, width=32)
        probes = spark.createDataFrame([("apple",)], "tok string")
        with pytest.raises(Exception, match="caller expects"):
            cms_probe(sk, probes, depth=2, width=64).collect()
        with pytest.raises(Exception, match="caller expects"):
            cms_merge(sk, cms_build(docs, "text", depth=3, width=32),
                      depth=2, width=32).collect()

    def test_bad_geometry_refused(self, spark):
        from db2pq_spark.operators.cms import cms_build

        with pytest.raises(ValueError, match="must be >= 1"):
            cms_build(_docs(spark), "text", depth=0, width=8)


class TestRocAuc:
    def test_perfect_separation(self, spark):
        from db2pq_spark.operators.evalmetrics import roc_auc

        df = spark.createDataFrame(
            [(10, 1), (20, 1), (1, 0), (2, 0)], "s long, y int")
        r = roc_auc(df, "s", F.col("y") == 1).collect()[0]
        assert (r["n_pos"], r["n_neg"]) == (2, 2)
        assert r["auc"] == 1.0

    def test_reversed_is_zero(self, spark):
        from db2pq_spark.operators.evalmetrics import roc_auc

        df = spark.createDataFrame(
            [(1, 1), (2, 1), (10, 0), (20, 0)], "s long, y int")
        assert roc_auc(df, "s", F.col("y") == 1).collect()[0]["auc"] \
            == 0.0

    def test_ties_half_credit(self, spark):
        from db2pq_spark.operators.evalmetrics import roc_auc

        # all scores equal: AUC must be exactly 0.5
        df = spark.createDataFrame(
            [(5, 1), (5, 1), (5, 0), (5, 0)], "s long, y int")
        r = roc_auc(df, "s", F.col("y") == 1).collect()[0]
        assert r["auc"] == 0.5

    def test_hand_computed_mixed_case(self, spark):
        from db2pq_spark.operators.evalmetrics import roc_auc

        # scores: pos {3, 1}, neg {2}; pairs: (3>2)=1, (1<2)=0 -> 0.5
        df = spark.createDataFrame(
            [(3, 1), (1, 1), (2, 0)], "s long, y int")
        r = roc_auc(df, "s", F.col("y") == 1).collect()[0]
        assert r["auc"] == 0.5 and r["u2"] == 2

    def test_single_class_is_null(self, spark):
        from db2pq_spark.operators.evalmetrics import roc_auc

        df = spark.createDataFrame([(1, 1), (2, 1)], "s long, y int")
        assert roc_auc(df, "s",
                       F.col("y") == 1).collect()[0]["auc"] is None


class TestTokenMi:
    def test_separating_tokens_rank_top(self, spark):
        from db2pq_spark.operators.quality import token_mi

        out = token_mi(_docs(spark), "text", "id", F.col("y") == 1,
                       k=10).collect()
        mi = {r["tok"]: r["mi"] for r in out}
        # 'apple' appears only in positives, 'dog' only in negatives:
        # both are perfect separators with equal MI
        assert mi["apple"] == mi["dog"] == max(mi.values())
        assert mi["apple"] > 0

    def test_presence_not_frequency(self, spark):
        from db2pq_spark.operators.quality import token_mi

        out = {r["tok"]: r for r in
               token_mi(_docs(spark), "text", "id", F.col("y") == 1,
                        k=10).collect()}
        # 'dog' occurs 4 times but in only 2 docs
        assert out["dog"]["n10"] == 2 and out["dog"]["n11"] == 0

    def test_uninformative_token_scores_zero(self, spark):
        from db2pq_spark.operators.quality import token_mi

        rows = [(1, "x common", 1), (2, "y common", 0)]
        df = spark.createDataFrame(rows, "id long, text string, y int")
        out = {r["tok"]: r["mi"] for r in
               token_mi(df, "text", "id", F.col("y") == 1, k=10)
               .collect()}
        assert out["common"] == 0.0


class TestCalibrationBuckets:
    def test_bucketing_and_brier(self, spark):
        from db2pq_spark.operators.evalmetrics import calibration_buckets

        rows = [(0.95, 1), (0.9, 1), (0.08, 0), (0.05, 0), (1.0, 1)]
        df = spark.createDataFrame(rows, "p double, y int")
        out = {r["bucket"]: r for r in
               calibration_buckets(df, "p", F.col("y") == 1)
               .collect()}
        # p = 1.0 clamps into the last bucket
        assert out[9]["n"] == 3 and out[9]["n_pos"] == 3
        assert out[0]["n"] == 2 and out[0]["mean_label"] == 0.0
        # perfect-ish predictions: brier small
        assert float(out[9]["sum_brier"]) < 0.02

    def test_bad_buckets_raise(self, spark):
        from db2pq_spark.operators.evalmetrics import calibration_buckets

        df = spark.createDataFrame([(0.5, 1)], "p double, y int")
        with pytest.raises(ValueError, match="n_buckets"):
            calibration_buckets(df, "p", F.col("y") == 1, n_buckets=0)


class TestPropagateLabels:
    def test_majority_outvotes_flip(self, spark):
        from db2pq_spark.operators.components import propagate_labels

        df = spark.createDataFrame(
            [(1, "en"), (2, "zz"), (3, "en"), (4, "fr")],
            "id long, lang string")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id1 long, id2 long")
        out = {r["id"]: r["label_repaired"]
               for r in propagate_labels(df, pairs, "id", "lang",
                                         src="id1", dst="id2")
               .collect()}
        assert out == {1: "en", 2: "en", 3: "en"}  # 4 is a singleton

    def test_tie_breaks_to_smallest_label(self, spark):
        from db2pq_spark.operators.components import propagate_labels

        df = spark.createDataFrame(
            [(1, "fr"), (2, "en")], "id long, lang string")
        pairs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
        out = propagate_labels(df, pairs, "id", "lang",
                               src="id1", dst="id2").collect()
        assert all(r["label_repaired"] == "en" for r in out)


class TestZipfFit:
    def test_zipfian_corpus_slope_near_minus_one(self, spark):
        from db2pq_spark.operators.textstats import zipf_fit

        # freq(rank r) = 60/r for 6 types: exactly Zipfian
        words = []
        for r, w in enumerate(["a", "b", "c", "d", "e", "f"], 1):
            words += [w] * (60 // r)
        df = spark.createDataFrame([(1, " ".join(words))],
                                   "id long, text string")
        r = zipf_fit(df, "text").collect()[0]
        assert r["n_types"] == 6
        assert r["n_tokens"] == sum(60 // i for i in range(1, 7))
        assert -1.1 < r["slope"] < -0.9
        assert r["r2"] > 0.99

    def test_uniform_corpus_slope_zero(self, spark):
        from db2pq_spark.operators.textstats import zipf_fit

        df = spark.createDataFrame(
            [(1, "aa bb cc dd aa bb cc dd")], "id long, text string")
        r = zipf_fit(df, "text").collect()[0]
        assert r["slope"] == 0.0  # all freqs equal -> flat line

    def test_single_type_degenerate_is_null(self, spark):
        from db2pq_spark.operators.textstats import zipf_fit

        df = spark.createDataFrame([(1, "aa aa aa")],
                                   "id long, text string")
        r = zipf_fit(df, "text").collect()[0]
        # one point: det = 0 -> no fit, refuse with NULLs
        assert r["slope"] is None and r["r2"] is None
        assert r["n_types"] == 1 and r["n_tokens"] == 3


class TestTokenDrift:
    def test_exploded_token_ranks_top(self, spark):
        from db2pq_spark.operators.quality import token_drift

        standing = spark.createDataFrame(
            [(1, "alpha beta gamma alpha beta")], "id long, text string")
        batch = spark.createDataFrame(
            [(2, "spam spam spam spam alpha")], "id long, text string")
        out = token_drift(standing, batch, "text", k=10).collect()
        assert out[0]["tok"] == "spam"          # absent from standing
        assert out[0]["kl_term"] > 0
        terms = {r["tok"]: r for r in out}
        assert terms["spam"]["cnt_a"] == 0
        assert terms["spam"]["cnt_b"] == 4
        # beta vanished from the batch -> negative contribution
        assert terms["beta"]["kl_term"] < 0

    def test_identical_corpora_terms_near_zero(self, spark):
        from db2pq_spark.operators.quality import token_drift

        df = spark.createDataFrame([(1, "x y z x y z")],
                                   "id long, text string")
        out = token_drift(df, df, "text", k=10).collect()
        assert all(abs(r["kl_term"]) < 1e-6 for r in out)
