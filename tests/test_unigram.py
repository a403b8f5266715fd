"""Unigram-LM tokenizer training/segmentation (operators/unigram.py,
q143/q144): seed construction, Viterbi determinism, hard-EM pruning,
coverage guarantees, and the oracle-replay SQL generators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd"), (3, "ababab")],
        "doc_id long, text string")


class TestSeed:
    def test_substring_counts(self, spark):
        from db2pq_spark.operators.bpe import word_freqs
        from db2pq_spark.operators.unigram import unigram_seed

        df = spark.createDataFrame([(1, "ab ab")],
                                   "doc_id long, text string")
        got = {r["piece"]: r["cnt"] for r in
               unigram_seed(word_freqs(df, "text"),
                            min_count=1).collect()}
        # "ab" appears twice as a word -> substrings a,b,ab each x2
        assert got == {"a": 2, "b": 2, "ab": 2}

    def test_min_count_prunes_multichar_keeps_chars(self, spark):
        from db2pq_spark.operators.bpe import word_freqs
        from db2pq_spark.operators.unigram import unigram_seed

        df = spark.createDataFrame([(1, "xy")],
                                   "doc_id long, text string")
        got = {r["piece"] for r in
               unigram_seed(word_freqs(df, "text"),
                            min_count=2).collect()}
        assert got == {"x", "y"}  # "xy" count 1 < min_count; chars stay

    def test_oversized_words_excluded(self, spark):
        from db2pq_spark.operators.bpe import word_freqs
        from db2pq_spark.operators.unigram import unigram_seed

        df = spark.createDataFrame(
            [(1, "ok " + "z" * 40)], "doc_id long, text string")
        got = {r["piece"] for r in
               unigram_seed(word_freqs(df, "text"),
                            min_count=1).collect()}
        assert "z" not in got and got == {"o", "k", "ok"}


class TestTrainSegment:
    def test_em_prunes_unused_pieces(self, spark, docs):
        from db2pq_spark.operators.unigram import unigram_train

        vocab = {r["piece"]: r["cnt"] for r in
                 unigram_train(docs, "text", rounds=2).collect()}
        # 'abab' dominates: its best segmentation is the whole-word
        # piece, so interior pieces like 'ba' get zero usage and are
        # pruned; single chars survive (coverage) even at zero count
        assert "abab" in vocab
        assert "ba" not in vocab
        for ch in "abcd":
            assert ch in vocab

    def test_segment_words_viterbi_is_deterministic(self, spark, docs):
        from db2pq_spark.operators.unigram import unigram_segment_words

        a = {r["word"]: (r["n_pieces"], r["pieces"]) for r in
             unigram_segment_words(docs, "text", rounds=1).collect()}
        b = {r["word"]: (r["n_pieces"], r["pieces"]) for r in
             unigram_segment_words(docs, "text", rounds=1).collect()}
        assert a == b
        # the frequent word segments as one piece
        assert a["abab"] == (1, "abab")

    def test_segment_documents_reassembles_in_order(self, spark, docs):
        from db2pq_spark.operators.unigram import unigram_segment

        got = {r["id"]: r for r in
               unigram_segment(docs, "text", "doc_id",
                               rounds=1).collect()}
        assert set(got) == {1, 2, 3}
        r1 = got[1]
        assert r1["n_words"] == 3
        # reassembly preserves word order: two 'abab' words then 'cd'
        assert r1["segmented"].startswith("abab")
        assert r1["segmented"].endswith("cd")
        assert r1["n_pieces"] == len(r1["segmented"].split(" "))

    def test_oversized_word_passes_through(self, spark):
        from db2pq_spark.operators.unigram import unigram_segment

        big = "z" * 40
        df = spark.createDataFrame(
            [(1, f"ab {big}")], "doc_id long, text string")
        row = unigram_segment(df, "text", "doc_id",
                              rounds=1).collect()[0]
        assert row["n_words"] == 2
        assert big in row["segmented"].split(" ")  # one opaque piece

    def test_coverage_no_word_dropped(self, spark, docs):
        """Every bounded word segments (chars always in vocab, floor
        for zero-usage chars) — the DP can never dead-end."""
        from db2pq_spark.operators.bpe import word_freqs
        from db2pq_spark.operators.unigram import unigram_segment_words

        words = {r["word"] for r in
                 word_freqs(docs, "text")
                 .where(F.length("word") <= 16).collect()}
        seg = {r["word"] for r in
               unigram_segment_words(docs, "text", rounds=2).collect()}
        assert seg == words


class TestOracleSql:
    """The SQL generators replay the Spark results bit-for-bit in
    DuckDB — the q143/q144 gate contract, checked here at toy scale so
    a drift fails fast and locally."""

    def _duck(self, docs_rows):
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", docs_rows)
        return con

    def test_train_matches_duckdb_replay(self, spark, docs):
        from db2pq_spark.operators.unigram import (
            unigram_round_sql, unigram_seed_sql, unigram_train)
        from db2pq_spark.workload_base import _TOKENS

        spark_v = {(r["piece"], r["cnt"]) for r in
                   unigram_train(docs, "text", rounds=2).collect()}
        sql = f"""
        WITH wf AS (
          SELECT w AS word, COUNT(*) AS freq FROM (
            SELECT unnest({_TOKENS}) AS w FROM documents
            WHERE text IS NOT NULL AND trim(text) <> '')
          WHERE w <> '' GROUP BY 1
        ),
        wfb AS (SELECT word, freq FROM wf WHERE len(word) <= 16),
        v0 AS ({unigram_seed_sql('wfb')}),
        {unigram_round_sql('r1', 'wfb', 'v0', 'v1')},
        {unigram_round_sql('r2', 'wfb', 'v1', 'v2')}
        SELECT piece, CAST(cnt AS BIGINT) AS cnt FROM v2
        """
        rows = [(r[0], int(r[1])) for r in self._duck(
            [(1, "abab abab cd"), (2, "abab cd cd"), (3, "ababab")])
            .execute(sql).fetchall()]
        assert spark_v == set(rows)

    def test_viterbi_matches_duckdb_replay(self, spark, docs):
        from db2pq_spark.operators.unigram import (
            unigram_seed_sql, unigram_segment_words,
            unigram_viterbi_sql)
        from db2pq_spark.workload_base import _TOKENS

        spark_v = {(r["word"], r["n_pieces"], r["pieces"]) for r in
                   unigram_segment_words(docs, "text",
                                         rounds=0).collect()}
        sql = f"""
        WITH wf AS (
          SELECT w AS word, COUNT(*) AS freq FROM (
            SELECT unnest({_TOKENS}) AS w FROM documents
            WHERE text IS NOT NULL AND trim(text) <> '')
          WHERE w <> '' GROUP BY 1
        ),
        wfb AS (SELECT word, freq FROM wf WHERE len(word) <= 16),
        v0 AS ({unigram_seed_sql('wfb')}),
        {unigram_viterbi_sql('fin', 'wfb', 'v0')}
        SELECT word, CAST(np AS BIGINT) AS np, path FROM fin_seg
        """
        rows = {(r[0], int(r[1]), r[2]) for r in self._duck(
            [(1, "abab abab cd"), (2, "abab cd cd"), (3, "ababab")])
            .execute(sql).fetchall()}
        assert spark_v == rows


class TestSegmentBatch:
    """unigram_vocab_state + unigram_segment_batch (q145): the
    train-once/tokenize-increments deployment shape with the _ug_conf
    stamp discipline."""

    def test_self_batch_matches_one_shot(self, spark, docs):
        from db2pq_spark.operators.unigram import (
            unigram_segment, unigram_segment_batch,
            unigram_vocab_state)

        vocab = unigram_vocab_state(docs, "text", rounds=1)
        inc = {r["id"]: (r["n_words"], r["n_pieces"], r["segmented"])
               for r in unigram_segment_batch(
                   docs, vocab, "text", "doc_id").collect()}
        one = {r["id"]: (r["n_words"], r["n_pieces"], r["segmented"])
               for r in unigram_segment(docs, "text", "doc_id",
                                        rounds=1).collect()}
        assert inc == one

    def test_oov_words_still_segment(self, spark, docs):
        from db2pq_spark.operators.unigram import (
            unigram_segment_batch, unigram_vocab_state)

        vocab = unigram_vocab_state(docs, "text", rounds=1)
        batch = spark.createDataFrame(
            [(9, "xyz ab " + "q" * 40)], "doc_id long, text string")
        row = unigram_segment_batch(batch, vocab, "text",
                                    "doc_id").collect()[0]
        # unseen chars take the floor (char-by-char), oversized word
        # passes through opaque
        assert row["n_words"] == 3
        assert "x y z" in row["segmented"]
        assert "q" * 40 in row["segmented"].split(" ")

    def test_stamp_discipline(self, spark, docs):
        from pyspark.sql import functions as F

        from db2pq_spark.operators.unigram import (
            unigram_segment_batch, unigram_vocab_state)

        vocab = unigram_vocab_state(docs, "text", rounds=1)
        # plan-time metadata fast path: zero jobs
        with pytest.raises(ValueError, match="l4/w16"):
            unigram_segment_batch(docs, vocab, "text", "doc_id",
                                  max_piece_len=2)
        with pytest.raises(ValueError, match="no _ug_conf stamp"):
            unigram_segment_batch(docs, vocab.drop("_ug_conf"),
                                  "text", "doc_id")
        # metadata-less wrong-family rows: per-row guard at execution
        nometa = vocab.select(
            "piece", "cnt",
            F.concat(F.lit("l9/w16"), F.lit("")).alias("_ug_conf"))
        assert not (nometa.schema["_ug_conf"].metadata or {})
        with pytest.raises(Exception, match="trained under"):
            unigram_segment_batch(docs, nometa, "text",
                                  "doc_id").collect()

    def test_state_parquet_round_trip(self, spark, docs, tmp_path):
        from db2pq_spark.operators.unigram import (
            unigram_segment_batch, unigram_vocab_state)

        p = str(tmp_path / "ug_vocab.parquet")
        unigram_vocab_state(docs, "text", rounds=1) \
            .write.parquet(p)
        vocab = spark.read.parquet(p)
        assert (vocab.schema["_ug_conf"].metadata or {}).get(
            "ug_conf") == "l4/w16"
        rows = unigram_segment_batch(docs, vocab, "text",
                                     "doc_id").collect()
        assert len(rows) == 3


class TestWordpiece:
    """wordpiece_segment_words / wordpiece_segment (q146): greedy
    longest-match with strict [UNK] semantics."""

    @pytest.fixture()
    def vocab(self, spark):
        return spark.createDataFrame(
            [("a",), ("b",), ("ab",), ("abab",), ("c",)],
            "piece string")

    def test_greedy_longest_match(self, spark, vocab):
        from db2pq_spark.operators.wordpiece import (
            wordpiece_segment_words)

        words = spark.createDataFrame(
            [("ababa", 1), ("abc", 1), ("ca", 1)],
            "word string, freq long")
        got = {r["word"]: (r["n_pieces"], r["pieces"]) for r in
               wordpiece_segment_words(words, vocab).collect()}
        # greedy takes 'abab' then 'a' (Viterbi might differ; greedy
        # is the defining behavior here)
        assert got["ababa"] == (2, "abab a")
        assert got["abc"] == (2, "ab c")
        assert got["ca"] == (2, "c a")

    def test_unk_on_unmatchable_and_oversized(self, spark, vocab):
        from db2pq_spark.operators.wordpiece import (
            wordpiece_segment_words)

        words = spark.createDataFrame(
            [("abxb", 1),        # 'x' matches nothing -> whole [UNK]
             ("zzz", 1),         # no char matches at all
             ("a" * 40, 1)],     # oversized -> [UNK]
            "word string, freq long")
        got = {r["word"]: (r["n_pieces"], r["pieces"]) for r in
               wordpiece_segment_words(words, vocab).collect()}
        assert got["abxb"] == (1, "[UNK]")
        assert got["zzz"] == (1, "[UNK]")
        assert got["a" * 40] == (1, "[UNK]")

    def test_document_reassembly_counts_unk(self, spark, vocab):
        from db2pq_spark.operators.wordpiece import wordpiece_segment

        df = spark.createDataFrame(
            [(1, "abab xq abab")], "doc_id long, text string")
        row = wordpiece_segment(df, "text", "doc_id",
                                vocab).collect()[0]
        assert row["n_words"] == 3 and row["n_unk"] == 1
        assert row["segmented"] == "abab [UNK] abab"
        assert row["n_pieces"] == 3

    def test_matches_duckdb_replay(self, spark, docs):
        """q146's contract at toy scale: Spark greedy == the unrolled
        SQL forward chain, vocabulary from one unigram-EM round."""
        from db2pq_spark.operators.unigram import (
            unigram_round_sql, unigram_seed_sql, unigram_train)
        from db2pq_spark.operators.wordpiece import (
            wordpiece_greedy_sql, wordpiece_segment_words)
        from db2pq_spark.workload_base import _TOKENS

        from db2pq_spark.operators.bpe import word_freqs

        vocab = unigram_train(docs, "text", rounds=1)
        words = word_freqs(docs, "text")
        spark_v = {(r["word"], r["n_pieces"], r["pieces"]) for r in
                   wordpiece_segment_words(words, vocab).collect()}
        sql = f"""
        WITH wf AS (
          SELECT w AS word, COUNT(*) AS freq FROM (
            SELECT unnest({_TOKENS}) AS w FROM documents
            WHERE text IS NOT NULL AND trim(text) <> '')
          WHERE w <> '' GROUP BY 1
        ),
        wfb AS (SELECT word, freq FROM wf WHERE len(word) <= 16),
        v0 AS ({unigram_seed_sql('wfb')}),
        {unigram_round_sql('r1', 'wfb', 'v0', 'v1')},
        {wordpiece_greedy_sql('wp', 'wf', 'v1')}
        SELECT word, CAST(np AS BIGINT) AS np, path FROM wp_seg
        """
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(1, "abab abab cd"), (2, "abab cd cd"),
                         (3, "ababab")])
        rows = {(r[0], int(r[1]), r[2])
                for r in con.execute(sql).fetchall()}
        assert spark_v == rows


class TestViterbiBatchKernel:
    """The r13 batched DP (NumPy position sweeps + selective
    path-string tie-break) must reproduce the per-word scalar loop
    bit-for-bit, including the lexicographic (score, np, path)
    tie-break."""

    def test_batch_kernel_matches_scalar_dp(self, spark):
        import numpy as np
        import pandas as pd

        import db2pq_spark.functions.arrow as A
        from db2pq_spark.operators import unigram as U

        rng = np.random.default_rng(7)
        mpl = 4
        words = ["abcde", "xy", "aaaa", "zzzzzzzz", "qrs", "abab",
                 "aa", "banana"]
        rows = []
        for wi, w in enumerate(words):
            n = len(w)
            for e in range(1, n + 1):
                for plen in range(1, min(mpl, e) + 1):
                    # singles always present (the floor); longer
                    # pieces ~60%; scores from a tiny set so (score,
                    # np) ties are common and the path tie-break is
                    # actually exercised
                    if plen == 1 or rng.random() < 0.6:
                        rows.append((w, 3 + wi, e, plen,
                                     w[e - plen:e],
                                     int(rng.integers(1, 4)) * 1000))
        pdf = pd.DataFrame(rows, columns=["word", "freq", "endpos",
                                          "plen", "piece", "s_bits"])

        # capture the inner batch kernel by stubbing run_grouped_map
        captured = {}
        orig = A.run_grouped_map
        A.run_grouped_map = (
            lambda df, key, schema, fn: captured.setdefault("fn", fn))
        try:
            U._viterbi_words(
                spark.createDataFrame([("a", 1)],
                                      "word string, freq long"),
                spark.createDataFrame([("a", 1)],
                                      "piece string, cnt long"), mpl)
        finally:
            A.run_grouped_map = orig
        out = captured["fn"](pdf)

        # scalar reference: the pre-r13 per-word DP, verbatim
        def scalar(word, cands):
            by_end = {}
            for e, plen, piece, sbits in cands:
                by_end.setdefault(e, []).append((plen, piece, sbits))
            n = len(word)
            best = [None] * (n + 1)
            best[0] = (0, 0, "", [])
            for j in range(1, n + 1):
                cur = None
                for plen, piece, sbits in sorted(by_end.get(j, [])):
                    prev = best[j - plen]
                    if prev is None:
                        continue
                    ps = (prev[2] + " " + piece) if prev[2] else piece
                    cand_t = (prev[0] + sbits, prev[1] + 1, ps,
                              prev[3] + [piece])
                    if cur is None or cand_t[:3] < cur[:3]:
                        cur = cand_t
                best[j] = cur
            b = best[n]
            return (b[3], b[1], b[0])

        got = {r["word"]: (list(r["path"]), int(r["np"]),
                           int(r["score_bits"]))
               for _, r in out.iterrows()}
        assert set(got) == set(words)
        for w in words:
            cands = [(int(r["endpos"]), int(r["plen"]), r["piece"],
                      int(r["s_bits"]))
                     for _, r in pdf[pdf["word"] == w].iterrows()]
            assert got[w] == scalar(w, cands), w


class TestWordpieceKernelFeed:
    """The r13 shuffle-free wordpiece kernel feed: run-buffering must
    hand whole words to the kernel even when Arrow batches are tiny,
    and the candidate-count completeness guard must accept every
    legitimate batch split."""

    def test_tiny_arrow_batches_match_default(self, spark):
        from db2pq_spark.operators.bpe import word_freqs
        from db2pq_spark.operators.unigram import unigram_train
        from db2pq_spark.operators.wordpiece import (
            wordpiece_segment_words)

        docs = spark.createDataFrame(
            [(1, "abab abab cd"), (2, "abab cd cd"), (3, "ababab"),
             (4, "zzz qqq abab"), (5, "a" * 20)],
            "doc_id long, text string")
        words = word_freqs(docs, "text")
        vocab = unigram_train(docs, "text", rounds=1)
        want = {(r["word"], int(r["freq"]), int(r["n_pieces"]),
                 r["pieces"])
                for r in wordpiece_segment_words(words, vocab)
                .collect()}
        old = spark.conf.get(
            "spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        try:
            got = {(r["word"], int(r["freq"]), int(r["n_pieces"]),
                    r["pieces"])
                   for r in wordpiece_segment_words(words, vocab)
                   .collect()}
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
        assert got == want and len(want) > 0
