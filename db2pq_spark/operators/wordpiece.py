"""WordPiece-style greedy longest-match segmentation.

[extension — not in the reference] The third tokenizer family next to
BPE (``operators/bpe.py``) and the unigram LM (``operators/unigram.py``):
BERT's WordPiece INFERENCE algorithm (Devlin et al. arXiv:1810.04805;
the MaxMatch / greedy longest-prefix-first procedure as published in
the BERT tokenizer) — at each position consume the LONGEST vocabulary
piece that matches, and if any position matches nothing (or the word
exceeds the length bound, BERT's ``max_input_chars_per_word``) the
WHOLE word degrades to a single ``[UNK]`` token. Deterministic by
construction: greedy choice is unique (one piece per (word, pos, len)),
no scores involved — which also makes the DuckDB oracle a plain
unrolled forward chain (one CTE per step, MATERIALIZED like the
unigram DP).

Unlike the unigram segmenter there is NO character floor: WordPiece's
contract is strict vocabulary membership with ``[UNK]`` fallback, which
is exactly what makes it the right inference pair for a FIXED deployed
vocabulary (the q145 ``unigram_vocab_state`` relation or any
``(piece, ...)`` table).

Scale shape — identical to the unigram E-step: segmentation runs on
the DISTINCT-WORD relation (one corpus tokenize); candidates are an
in-row substring explode joined to the vocabulary (broadcast when it
fits); the greedy walk is an Arrow kernel over grouped candidate
lists, O(len) per word; documents pay one word-keyed join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db2pq_spark.operators.unigram import MAX_PIECE_LEN, MAX_WORD_LEN

__all__ = ["wordpiece_segment_words", "wordpiece_segment",
           "wordpiece_greedy_sql"]

UNK = "[UNK]"


def wordpiece_segment_words(
    words: DataFrame, vocab: DataFrame,
    max_piece_len: int = MAX_PIECE_LEN,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Greedy-segment each distinct ``(word, freq)`` against a
    ``(piece, ...)`` vocabulary: ``(word, freq, n_pieces, pieces)``
    with ``pieces`` the space-joined match sequence, or ``[UNK]``
    (n_pieces 1) when a position matches nothing or the word exceeds
    ``max_word_len``."""
    import pandas as pd

    from db2pq_spark.functions.arrow import series_pandas_udf

    bounded = words.where(F.length("word") <= max_word_len)
    oversized = words.where(F.length("word") > max_word_len).select(
        "word", "freq", F.lit(1).cast("bigint").alias("n_pieces"),
        F.lit(UNK).alias("pieces"))
    cand = bounded.select(
        "word", "freq",
        F.explode(F.flatten(F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(F.lit(0),
                           F.least(F.lit(max_piece_len),
                                   F.length("word") - i + 1) - 1),
                lambda n: F.struct(
                    i.alias("startpos"),
                    (n + 1).alias("plen"),
                    F.col("word").substr(i, n + 1).alias("piece"))),
        ))).alias("c"))
    matched = (cand.join(
        vocab.select("piece").distinct().hint("broadcast"),
        cand["c.piece"] == F.col("piece"), "left_semi")
        .select("word", "freq", F.col("c.startpos").alias("startpos"),
                F.col("c.plen").alias("plen")))
    # words with ZERO matched candidates drop out of the aggregate —
    # re-attached as [UNK] via the left join below
    grouped = (matched.groupBy("word", "freq")
               .agg(F.collect_list(F.struct("startpos", "plen"))
                    .alias("cands")))

    def greedy(words_s, cands_s):
        out = []
        for word, cands in zip(words_s, cands_s):
            by_start: dict[int, int] = {}
            for c in cands:
                s = int(c["startpos"])
                by_start[s] = max(by_start.get(s, 0), int(c["plen"]))
            pos, pieces = 1, []
            n = len(word)
            while pos <= n:
                plen = by_start.get(pos, 0)
                if plen == 0:
                    pieces = None  # unmatchable position -> [UNK]
                    break
                pieces.append(word[pos - 1:pos - 1 + plen])
                pos += plen
            if pieces is None:
                out.append((1, UNK))
            else:
                out.append((len(pieces), " ".join(pieces)))
        return pd.DataFrame(out, columns=["n_pieces", "pieces"])

    kern = series_pandas_udf(
        greedy, "struct<n_pieces: long, pieces: string>")
    seg = grouped.select(
        "word", "freq", kern(F.col("word"), F.col("cands")).alias("r")
    ).select("word", "freq", F.col("r.n_pieces").alias("n_pieces"),
             F.col("r.pieces").alias("pieces"))
    labeled = bounded.select("word", "freq").join(
        seg.select("word", "n_pieces", "pieces"), "word", "left"
    ).select("word", "freq",
             F.coalesce("n_pieces", F.lit(1)).cast("bigint")
              .alias("n_pieces"),
             F.coalesce("pieces", F.lit(UNK)).alias("pieces"))
    return labeled.unionByName(oversized)


def wordpiece_segment(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame,
    max_piece_len: int = MAX_PIECE_LEN,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Segment every document with greedy WordPiece against a fixed
    vocabulary: ``(id, n_words, n_unk, n_pieces, segmented)`` — the
    BERT-inference twin of :func:`..unigram.unigram_segment_batch`
    (same one-tokenize / one-word-keyed-join corpus cost; ``n_unk``
    counts the words that degraded, the standard tokenizer-coverage
    health metric)."""
    from db2pq_spark.operators.dedup import normalize_text

    toks = (df.filter(F.col(text_col).isNotNull()
                      & (F.trim(F.col(text_col)) != ""))
            .select(F.col(id_col).alias("id"),
                    F.posexplode(F.split(normalize_text(text_col),
                                         " ")).alias("pos", "word"))
            .where(F.col("word") != ""))
    words = toks.select("word").distinct() \
        .select("word", F.lit(1).alias("freq"))
    seg = wordpiece_segment_words(words, vocab, max_piece_len,
                                  max_word_len) \
        .select("word", "n_pieces", "pieces")
    joined = toks.join(seg, "word", "left").select(
        "id", "pos",
        F.coalesce("pieces", F.lit(UNK)).alias("pieces"),
        F.coalesce("n_pieces", F.lit(1)).alias("np"))
    return (joined.groupBy("id")
            .agg(F.count("*").alias("n_words"),
                 F.count(F.when(F.col("pieces") == UNK, 1))
                  .alias("n_unk"),
                 F.sum("np").alias("n_pieces"),
                 F.concat_ws(" ", F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("pos", "pieces"))),
                     lambda s: s["pieces"])).alias("segmented"))
            .select("id",
                    F.col("n_words").cast("bigint").alias("n_words"),
                    F.col("n_unk").cast("bigint").alias("n_unk"),
                    F.col("n_pieces").cast("bigint").alias("n_pieces"),
                    "segmented"))


def wordpiece_greedy_sql(tag: str, words: str, vocab: str,
                         max_piece_len: int = MAX_PIECE_LEN,
                         max_word_len: int = MAX_WORD_LEN) -> str:
    """DuckDB oracle: CTE chain ``{tag}_cand, {tag}_g0..{tag}_g{W},
    {tag}_seg`` replaying the greedy walk closed-form — each step
    advances every unfinished word by its longest match at the
    current position (or marks it stuck); after ``max_word_len``
    steps every bounded word is finished (each step advances ≥ 1
    char). ``{tag}_seg`` has ``(word, np, path)`` with stuck AND
    oversized words as ``[UNK]``/np 1."""
    W = max_word_len
    ctes = [f"""
    {tag}_cand AS MATERIALIZED (
      SELECT c.word, c.startpos,
             MAX(c.plen) AS plen
      FROM (
        SELECT word, i.i AS startpos, n.n AS plen,
               substr(word, i.i, n.n) AS piece
        FROM {words},
             LATERAL (SELECT unnest(generate_series(1, len(word)))
                      AS i) i,
             LATERAL (SELECT unnest(generate_series(1,
                      LEAST({max_piece_len}, len(word) - i.i + 1)))
                      AS n) n
        WHERE len(word) <= {W}
      ) c
      SEMI JOIN {vocab} v ON c.piece = v.piece
      GROUP BY c.word, c.startpos
    ),
    {tag}_g0 AS MATERIALIZED (
      SELECT word, 1 AS pos, '' AS path, 0 AS np, FALSE AS stuck
      FROM {words} WHERE len(word) <= {W}
    )"""]
    for k in range(1, W + 1):
        ctes.append(f"""
    {tag}_g{k} AS MATERIALIZED (
      SELECT word, pos, path, np, stuck
      FROM {tag}_g{k - 1} WHERE pos > len(word) OR stuck
      UNION ALL
      SELECT a.word,
             a.pos + COALESCE(c.plen, 0) AS pos,
             CASE WHEN c.plen IS NULL THEN a.path
                  WHEN a.path = '' THEN substr(a.word, a.pos, c.plen)
                  ELSE a.path || ' ' || substr(a.word, a.pos, c.plen)
             END AS path,
             a.np + CASE WHEN c.plen IS NULL THEN 0 ELSE 1 END AS np,
             c.plen IS NULL AS stuck
      FROM {tag}_g{k - 1} a
      LEFT JOIN {tag}_cand c
        ON c.word = a.word AND c.startpos = a.pos
      WHERE a.pos <= len(a.word) AND NOT a.stuck
    )""")
    ctes.append(f"""
    {tag}_seg AS MATERIALIZED (
      SELECT word,
             CASE WHEN stuck THEN 1 ELSE np END AS np,
             CASE WHEN stuck THEN '[UNK]' ELSE path END AS path
      FROM {tag}_g{W}
      UNION ALL
      SELECT word, 1 AS np, '[UNK]' AS path
      FROM {words} WHERE len(word) > {W}
    )""")
    return ",".join(ctes)
