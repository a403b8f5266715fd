"""Vocabulary construction and document encoding.

[extension — not in the reference] The step between text cleaning and
sequence packing in a training-data pipeline: build a corpus
vocabulary (token → dense integer id by frequency rank) and encode
every document as an ``array<bigint>`` of token ids ready for
tokenizer-side consumption (operators/chunking.py packs these).

Scale notes (100 TB mindset):

- ``build_vocab`` is the heavy-hitters aggregation: explode →
  partial+final count (the only corpus-sized shuffle, keyed by token,
  map-side combine collapses each partition to its vocabulary first)
  → rank. The global frequency rank uses the two-stage construction
  in :mod:`db2pq_spark.operators.ranking` (range repartition →
  per-partition rank → offset merge), so even a huge vocabulary never
  funnels through one partition; ``max_size`` additionally caps it to
  the ``k`` most frequent tokens (TakeOrderedAndProject) — the
  standard "top-k vocab + OOV" modeling choice.
- ``encode_documents`` never collects the vocabulary to the driver:
  tokens are exploded with position, hash-joined against the vocab
  relation (vocab is broadcast when it fits — Catalyst/AQE sizes it),
  and re-assembled per document with one doc-keyed shuffle.
  Out-of-vocabulary tokens map to ``oov_id`` (default −1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db2pq_spark.operators.textstats import tokens


def build_vocab(df: DataFrame, text_col: str,
                max_size: int | None = None) -> DataFrame:
    """(token, token_id, freq): dense ids assigned by descending
    frequency, ties broken by token text — a total order, so ids are
    deterministic and engine-portable. ``max_size`` keeps the ``k``
    most frequent tokens (everything else becomes OOV at encode
    time)."""
    from db2pq_spark.operators.ranking import with_global_rank

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token").agg(F.count("*").alias("freq"))
    )
    if max_size is not None:
        counts = counts.orderBy(F.desc("freq"), F.asc("token")) \
                       .limit(max_size)
    # a capped vocab is bounded by construction → the ranker's
    # one-partition fast path; unbounded vocabs take the two-stage
    # distributed rank (no single-partition stage at corpus scale)
    ranked = with_global_rank(
        counts, [F.desc("freq"), F.asc("token")], rank_col="_rank",
        bounded=max_size)
    return ranked.select(
        "token",
        (F.col("_rank") - 1).cast("bigint").alias("token_id"),
        "freq",
    )


def encode_documents(df: DataFrame, text_col: str, id_col: str,
                     vocab: DataFrame, oov_id: int = -1) -> DataFrame:
    """(id, token_ids, n_tokens): each document as an ordered
    ``array<bigint>`` of vocabulary ids. Join-based — the vocabulary
    never touches the driver; documents with no tokens encode to an
    empty array."""
    pos = (
        df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        .select(F.col(id_col),
                F.posexplode_outer("_toks").alias("pos", "token"))
    )
    joined = (
        pos.join(vocab.select("token", "token_id"), "token", "left")
        .select(F.col(id_col), "pos",
                F.coalesce("token_id", F.lit(oov_id)).alias("tid"))
    )
    grouped = (
        joined.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("pos", "tid")))
              .alias("_ordered"))
    )
    # null-text docs surface as a single (pos=NULL, tid=oov) struct via
    # posexplode_outer — filtered here so they encode to an empty array
    staged = grouped.select(
        F.col(id_col),
        F.transform(
            F.filter("_ordered", lambda s: s["pos"].isNotNull()),
            lambda s: s["tid"],
        ).alias("token_ids"),
    )
    return staged.select(
        F.col(id_col), "token_ids",
        F.size("token_ids").cast("bigint").alias("n_tokens"),
    )
