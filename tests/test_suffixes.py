"""Suffix-doubling exact-substring dedup (operators/suffixes.py,
q149/q150): exact longest-match lengths, the LCP-extension property,
removal coverage semantics, and hash/exact key-mode agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLongestDupSpan:
    def test_simple_cross_doc_match(self, spark):
        from db2pq_spark.operators.suffixes import longest_dup_span

        df = _docs(spark, [
            (1, "the quick brown fox jumps high"),
            (2, "a quick brown fox sleeps"),
        ])
        out = {r["doc_id"]: r for r in
               longest_dup_span(df, "text", "doc_id").collect()}
        # longest shared run: "quick brown fox" (3 tokens)
        assert out[1]["max_dup_len"] == 3
        assert out[1]["max_dup_pos"] == 2
        assert out[2]["max_dup_len"] == 3
        assert out[2]["max_dup_pos"] == 2

    def test_extension_beyond_power_of_two(self, spark):
        # 5-token match: survives doubling to 4, extension adds 1 —
        # the case pure power-of-two resolution gets wrong
        from db2pq_spark.operators.suffixes import longest_dup_span

        df = _docs(spark, [
            (1, "p q r s t zebra"),
            (2, "p q r s t yak"),
        ])
        out = {r["doc_id"]: r["max_dup_len"] for r in
               longest_dup_span(df, "text", "doc_id").collect()}
        assert out == {1: 5, 2: 5}

    def test_within_doc_overlapping_repeat(self, spark):
        # "a b a b a": "a b a" occurs at pos 1 and pos 3 (overlap) —
        # same-doc overlapping occurrences count, as in Lee et al.
        from db2pq_spark.operators.suffixes import longest_dup_span

        df = _docs(spark, [(1, "a b a b a"), (2, "x y z w v")])
        out = {r["doc_id"]: r for r in
               longest_dup_span(df, "text", "doc_id").collect()}
        assert out[1]["max_dup_len"] == 3
        assert out[1]["max_dup_pos"] == 1
        # doc 2 shares no token with anything
        assert out[2]["max_dup_len"] == 0
        assert out[2]["max_dup_pos"] == 0

    def test_second_half_prune_does_not_lose_matches(self, spark):
        # "x y z" duplicated but "z w" unique: the level-2 candidate
        # at pos 1 is pruned (its second half isn't duplicated), yet
        # the level-1 extension must still find the exact 3
        from db2pq_spark.operators.suffixes import longest_dup_span

        df = _docs(spark, [(1, "x y z w x y z")])
        out = longest_dup_span(df, "text", "doc_id").collect()[0]
        assert out["max_dup_len"] == 3 and out["max_dup_pos"] == 1

    def test_hash_and_exact_agree_on_fixture(self, spark):
        from db2pq_spark.operators.suffixes import longest_dup_span
        from tests.conftest import SF_SMOKE

        df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = sorted(map(tuple, longest_dup_span(
            df, "text", "doc_id", keys="exact").collect()))
        b = sorted(map(tuple, longest_dup_span(
            df, "text", "doc_id", keys="hash").collect()))
        assert a == b
        assert max(r[2] for r in a) > 1  # fixture exercises doubling

    def test_max_bucket_is_lower_bound(self, spark):
        from db2pq_spark.operators.suffixes import longest_dup_span
        from tests.conftest import SF_SMOKE

        df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        exact = {r["doc_id"]: r["max_dup_len"] for r in
                 longest_dup_span(df, "text", "doc_id").collect()}
        capped = {r["doc_id"]: r["max_dup_len"] for r in
                  longest_dup_span(df, "text", "doc_id",
                                   max_bucket=2).collect()}
        for d, m in capped.items():
            assert m <= exact[d]
            # the doubling floor is never capped away: if exact >= 2^k
            # then capped >= the same power-of-two floor
            floor = 1 << (exact[d].bit_length() - 1) if exact[d] else 0
            assert m >= floor


class TestRemoveLongDupSpans:
    def test_cuts_only_long_runs(self, spark):
        from db2pq_spark.operators.suffixes import remove_long_dup_spans

        boiler = "one two three four five six seven eight"
        df = _docs(spark, [
            (1, f"{boiler} alpha beta"),
            (2, f"gamma {boiler} delta"),
            (3, "alpha gamma unrelated words here"),
        ])
        out = {r["doc_id"]: r for r in
               remove_long_dup_spans(df, "text", "doc_id",
                                     min_len=8).collect()}
        assert out[1]["cleaned"] == "alpha beta"
        assert out[1]["n_removed"] == 8
        assert out[2]["cleaned"] == "gamma delta"
        # short shared tokens (alpha/gamma) never reach min_len=8
        assert out[3]["n_removed"] == 0
        assert out[3]["cleaned"] == "alpha gamma unrelated words here"

    def test_overlapping_runs_merge(self, spark):
        # a fully duplicated doc collapses to empty, counted once
        from db2pq_spark.operators.suffixes import remove_long_dup_spans

        text = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
        df = _docs(spark, [(1, text), (2, text)])
        out = {r["doc_id"]: r for r in
               remove_long_dup_spans(df, "text", "doc_id",
                                     min_len=8).collect()}
        for d in (1, 2):
            assert out[d]["n_removed"] == 10
            assert out[d]["cleaned"] == ""

    def test_keep_one_spares_exemplar_island(self, spark):
        from db2pq_spark.operators.suffixes import remove_long_dup_spans

        boiler = "one two three four five six seven eight"
        df = _docs(spark, [
            (1, f"{boiler} alpha beta"),
            (2, f"gamma {boiler} delta"),
            (3, f"{boiler} epsilon"),
        ])
        out = {r["doc_id"]: r for r in
               remove_long_dup_spans(df, "text", "doc_id", min_len=8,
                                     keep="one").collect()}
        # all three docs merge the boiler run into an identical
        # 8-token island; exemplar = min (id, start) -> doc 1 keeps
        # its copy, docs 2 and 3 lose theirs
        assert out[1]["n_removed"] == 0
        assert out[1]["cleaned"].endswith("alpha beta")
        assert "one two three" in out[1]["cleaned"]
        assert out[2]["cleaned"] == "gamma delta"
        assert out[2]["n_removed"] == 8
        assert out[3]["cleaned"] == "epsilon"

    def test_keep_one_invalid_raises(self, spark):
        from db2pq_spark.operators.suffixes import remove_long_dup_spans

        import pytest as _pytest
        df = _docs(spark, [(1, "a b c")])
        with _pytest.raises(ValueError, match="keep"):
            remove_long_dup_spans(df, "text", "doc_id", keep="all")

    def test_composes_with_span_scores(self, spark):
        # the q102 composition: score first, cut the flagged docs
        from db2pq_spark.operators.dedup import duplicate_spans
        from db2pq_spark.operators.suffixes import remove_long_dup_spans
        from tests.conftest import SF_SMOKE

        df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        cleaned = remove_long_dup_spans(df, "text", "doc_id",
                                        min_len=8)
        # removal output feeds the fixed-n scorer unchanged
        rescored = duplicate_spans(
            cleaned.where(F.col("cleaned") != ""), "cleaned",
            "doc_id", n=8)
        assert rescored.count() > 0
