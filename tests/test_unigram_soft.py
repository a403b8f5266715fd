"""Soft-EM unigram training (operators/unigram_soft.py, q148):
forward-backward posterior invariants, expected-count M-step,
likelihood-loss pruning, and hard-EM parity on dominant corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    # "xy" overwhelmingly dominant -> its lattice is effectively
    # unambiguous after training; "qr" rare
    rows = [(i, "xy xy xy xy xy xy xy xy") for i in range(8)]
    rows.append((100, "qr xy"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _wf(spark, docs):
    from db2pq_spark.operators.bpe import word_freqs

    return word_freqs(docs, "text")


class TestForwardBackward:
    def test_posteriors_cover_each_word_exactly(self, spark, docs):
        # lattice identity: sum over occurrences of post * plen =
        # len(word) — every char is covered by exactly one piece in
        # every segmentation, so expected coverage is the word length
        from db2pq_spark.operators.unigram import unigram_seed
        from db2pq_spark.operators.unigram_soft import _fb_words

        wf = _wf(spark, docs)
        vocab = unigram_seed(wf, min_count=1).select(
            "piece", (F.col("cnt") * 1_000_000).cast("bigint")
            .alias("cnt"))
        fb = _fb_words(wf, vocab, 4)
        cov = (fb.groupBy("word")
               .agg(F.sum(F.col("post") * F.length("piece"))
                    .alias("cov"))
               .collect())
        assert cov, "no words"
        for r in cov:
            assert r["cov"] == pytest.approx(len(r["word"]), abs=1e-9)

    def test_posterior_of_full_width_piece_dominates(self, spark, docs):
        from db2pq_spark.operators.unigram import unigram_seed
        from db2pq_spark.operators.unigram_soft import (
            _fb_words, soft_em_round)

        wf = _wf(spark, docs)
        vocab = unigram_seed(wf, min_count=1).select(
            "piece", (F.col("cnt") * 1_000_000).cast("bigint")
            .alias("cnt"))
        # after one soft round, "xy" has absorbed most of the mass
        vocab = soft_em_round(wf, vocab, 4)
        fb = {(r["word"], r["piece"]): r["post"]
              for r in _fb_words(wf, vocab, 4).collect()}
        assert fb[("xy", "xy")] > 0.9
        assert fb[("xy", "x")] < 0.1


class TestSoftRound:
    def test_chars_retained_multi_pruned(self, spark):
        from db2pq_spark.operators.unigram import unigram_seed
        from db2pq_spark.operators.unigram_soft import soft_em_round

        df = spark.createDataFrame([(1, "ab ab ab ab")],
                                   "doc_id long, text string")
        wf = _wf(spark, df)
        vocab = unigram_seed(wf, min_count=1).select(
            "piece", (F.col("cnt") * 1_000_000).cast("bigint")
            .alias("cnt"))
        out = {r["piece"]: r["cnt"] for r in
               soft_em_round(wf, vocab, 4).collect()}
        # chars always present (possibly at ~0), "ab" holds the mass
        assert set(out) == {"a", "b", "ab"}
        assert out["ab"] > out["a"] and out["ab"] > out["b"]
        # expected counts are conserved: total expected covered chars
        # = freq * len = 4 * 2 -> ab*2 + a + b = 8 (in micro units)
        total = 2 * out["ab"] + out["a"] + out["b"]
        assert total == pytest.approx(8_000_000, abs=8)


class TestPrune:
    def test_chars_survive_and_size_capped(self, spark, docs):
        from db2pq_spark.operators.unigram_soft import unigram_train_soft

        out = unigram_train_soft(docs, "text", rounds=1,
                                 vocab_size=5).collect()
        pieces = {r["piece"] for r in out}
        chars = {p for p in pieces if len(p) == 1}
        assert {"x", "y", "q", "r"} <= chars
        assert len(out) <= max(5, len(chars))

    def test_prune_keeps_highest_loss_piece(self, spark, docs):
        # with room for ONE multi-char piece, the dominant "xy" must
        # be the survivor (its removal costs the most likelihood)
        from db2pq_spark.operators.unigram_soft import unigram_train_soft

        out = unigram_train_soft(docs, "text", rounds=2,
                                 vocab_size=5).collect()
        multi = [r["piece"] for r in out if len(r["piece"]) > 1]
        assert multi == ["xy"]

    def test_alt_viterbi_excludes_full_width(self, spark):
        from db2pq_spark.operators.unigram import _viterbi_words
        from db2pq_spark.operators.unigram_soft import (
            _floor_bits_micro, _scores)

        vocab = spark.createDataFrame(
            [("a", 1_000_000), ("b", 1_000_000), ("ab", 8_000_000)],
            "piece string, cnt long")
        words = spark.createDataFrame([("ab", 1)],
                                      "word string, freq long")
        r = _viterbi_words(words, vocab, 4, scores=_scores(vocab),
                           floor=_floor_bits_micro(vocab),
                           exclude_full=True).collect()[0]
        # without exclusion the best path is ["ab"]; with it, the
        # alternative segmentation must be the two chars
        assert list(r["path"]) == ["a", "b"] and r["np"] == 2


class TestHardSoftParity:
    def test_agree_on_dominant_corpus(self, spark, docs):
        # verdict-requested parity: where the lattice is effectively
        # unambiguous (one dominant segmentation), hard-EM (Viterbi
        # counts) and soft-EM (expected counts) must retain the same
        # piece set, rank pieces identically by count, and give the
        # dominant piece (within rounding) the same mass
        from db2pq_spark.operators.unigram import unigram_train
        from db2pq_spark.operators.unigram_soft import (
            soft_em_round, unigram_seed)
        from db2pq_spark.operators.bpe import word_freqs

        wf = word_freqs(docs, "text").where(F.length("word") <= 16)
        hard = {r["piece"]: r["cnt"] for r in
                unigram_train(docs, "text", rounds=2).collect()}
        vocab = unigram_seed(wf, min_count=2).select(
            "piece", (F.col("cnt") * 1_000_000).cast("bigint")
            .alias("cnt"))
        for _ in range(2):
            vocab = soft_em_round(wf, vocab, 4)
        soft = {r["piece"]: r["cnt"] for r in vocab.collect()}
        assert set(hard) == set(soft)
        rank = lambda d: sorted(d, key=lambda p: (-d[p], p))  # noqa: E731
        # multi-char pieces (the trained vocabulary proper) rank
        # identically; tail CHAR mass legitimately differs — hard EM
        # is winner-take-all (chars of a dominated word score 0),
        # soft EM shares residual lattice mass across chars
        multi_rank = lambda d: [p for p in rank(d) if len(p) > 1]  # noqa: E731
        assert multi_rank(hard) == multi_rank(soft)
        assert rank(hard)[0] == rank(soft)[0]
        # dominant piece's expected count approaches its hard count
        # (the winner-take-all limit) as rounds grow; at 2 rounds the
        # lattice still shares ~6% of mass with the char path
        top = rank(hard)[0]
        assert soft[top] == pytest.approx(hard[top] * 1_000_000,
                                          rel=0.1)


class TestRunGroupedMap:
    """The shuffle-free kernel feed (functions/arrow.py:
    run_grouped_map) — r13's replacement for the word-keyed
    collect_list exchange."""

    def test_runs_survive_tiny_arrow_batches(self, spark):
        # force 3-row Arrow batches so word runs straddle batch
        # boundaries: the tail-run buffering must hand the kernel only
        # complete runs, or per-word sums come out fragmented
        from db2pq_spark.functions.arrow import run_grouped_map

        old = spark.conf.get(
            "spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        try:
            rows = [(f"w{i:02d}", j) for i in range(7)
                    for j in range(i + 1)]  # runs of size 1..7
            df = spark.createDataFrame(rows, "word string, v long") \
                .coalesce(1)

            def sums(pdf):
                import pandas as pd
                g = pdf.groupby("word", sort=False)["v"].agg(
                    ["sum", "size"]).reset_index()
                return pd.DataFrame({"word": g["word"],
                                     "s": g["sum"], "n": g["size"]})

            out = {r["word"]: (r["s"], r["n"])
                   for r in run_grouped_map(
                       df, "word", "word string, s long, n long",
                       sums).collect()}
            assert out == {f"w{i:02d}": (sum(range(i + 1)), i + 1)
                           for i in range(7)}
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)

    def test_fb_batch_kernel_matches_scalar_dp(self):
        # pure-pandas pin: the vectorized alpha/beta sweep must
        # reproduce the per-word scalar forward-backward bit-for-bit
        # (same left-associated float chain; absent candidates add
        # exact +0.0)
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(42)
        mpl = 4
        words = ["abcde", "xy", "a", "zzzzzzzz", "qrs"]
        rows = []
        for w in words:
            n = len(w)
            for e in range(1, n + 1):
                for plen in range(1, min(mpl, e) + 1):
                    # singles always present; longer pieces ~60%
                    if plen == 1 or rng.random() < 0.6:
                        rows.append((w, 7, e, plen, w[e - plen:e],
                                     float(rng.random())))
        pdf = pd.DataFrame(rows, columns=["word", "freq", "endpos",
                                          "plen", "piece", "p"])

        # scalar reference: the pre-r13 per-word DP, verbatim
        def scalar(word, cands):
            n = len(word)
            by = {}
            for e, plen, p in cands:
                by[(e, plen)] = (word[e - plen:e], float(p))
            alpha = [0.0] * (n + 1)
            alpha[0] = 1.0
            for j in range(1, n + 1):
                s = 0.0
                for plen in range(1, min(mpl, j) + 1):
                    c = by.get((j, plen))
                    if c is not None:
                        s = s + alpha[j - plen] * c[1]
                alpha[j] = s
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for j in range(n - 1, -1, -1):
                s = 0.0
                for plen in range(1, min(mpl, n - j) + 1):
                    c = by.get((j + plen, plen))
                    if c is not None:
                        s = s + c[1] * beta[j + plen]
                beta[j] = s
            an = alpha[n]
            return {(e, plen): ((alpha[e - plen] * p) * beta[e]) / an
                    for (e, plen), (_, p) in by.items()}

        from db2pq_spark.operators import unigram_soft as US

        # capture _fb_words' inner batch kernel: stub out the Spark
        # seams (_soft_cands and run_grouped_map), call it directly on
        # the flat candidate frame (one call = all runs complete)
        import db2pq_spark.functions.arrow as A

        class _Stub:
            def select(self, *a, **k):
                return self

        captured = {}
        orig_rgm, orig_sc = A.run_grouped_map, US._soft_cands
        A.run_grouped_map = (
            lambda df, key, schema, fn: captured.setdefault("fn", fn))
        US._soft_cands = lambda *a, **k: _Stub()
        try:
            US._fb_words(None, None, mpl)
        finally:
            A.run_grouped_map, US._soft_cands = orig_rgm, orig_sc
        out = captured["fn"](pdf)
        # output rows are 1:1 with input rows
        assert len(out) == len(pdf)
        for i in range(len(pdf)):
            w = pdf.iloc[i]["word"]
            cands = [(int(r["endpos"]), int(r["plen"]), r["p"])
                     for _, r in pdf[pdf["word"] == w].iterrows()]
            ref = scalar(w, cands)
            got = out.iloc[i]["post"]
            key = (int(pdf.iloc[i]["endpos"]), int(pdf.iloc[i]["plen"]))
            assert got == ref[key], (w, key)
