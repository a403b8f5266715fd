"""Seed-classifier corpus quality scoring.

The GPT-3 / CCNet-family pretraining pipelines filter web text with a
lightweight linear classifier trained on a "looks like the good
corpus" seed (GPT-3 appendix A; fastText-style bag-of-words models):
label a small high-quality seed positive, everything else negative,
score every document with the log-likelihood ratio of its tokens, and
keep by threshold (or Pareto-sample near it). This module is the
relational form of that filter — multinomial Naive Bayes with Laplace
smoothing, trained and applied in one Spark job, no model file, no
iterations, no driver-side state.

Reference repo has no quality surface (it is an ETL/sync library —
``/root/reference/README.md:1-17``); this is a driver-charter
[extension] following the published pipeline designs.

Why Naive Bayes and not logistic regression: NB's per-token weights
are CLOSED-FORM aggregates (class-conditional counts), so training is
two corpus passes fused into one vocabulary aggregate — fully
expressible in relational algebra, bit-replayable by the DuckDB
oracle, and exactly the "hashed bag-of-words linear scorer" shape the
production filters deploy. At 100 TB: one explode + one zipf-bounded
vocabulary aggregate + an AQE-broadcast weight join + one doc-keyed
re-aggregate — the proven unigram-surprisal plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db2pq_spark.operators.textstats import tokens


def nb_quality_scores(
    df: DataFrame, text_col: str, id_col: str, positive: Column,
    alpha: float = 1.0, round_digits: int = 6,
) -> DataFrame:
    """Per-document quality log-odds under a seed-trained multinomial
    Naive Bayes: ``score(d) = Σ_t∈d log2( p(t|pos) / p(t|neg) )`` with
    Laplace-``alpha`` smoothing over the corpus vocabulary,

        p(t|c) = (count_c(t) + α) / (N_c + α·V).

    ``positive`` is a boolean Column over ``df``'s columns marking the
    high-quality seed (e.g. ``F.col("source") == "wiki"``). Documents
    from BOTH classes are scored — including the seed itself, which is
    how the production filters calibrate their keep-threshold.

    Returns ``(id, n_tokens, sum_logodds, mean_logodds)``:
    ``sum_logodds`` is the exact DECIMAL accumulation of per-token
    log-odds rounded to ``round_digits`` (order-independent — the
    value the oracle hash-compares; engines agree wherever their
    ``log2`` doubles agree), ``mean_logodds`` the double convenience
    for threshold filters (positive ⇒ seed-like).

    Plan shape (the :func:`~db2pq_spark.operators.textstats.
    unigram_surprisal` pattern): ONE corpus explode feeds a single
    vocabulary aggregate with conditional partial counts (``cp`` =
    positive-class occurrences, ``cn`` = negative) — one pass, not one
    per class; class totals and vocabulary size come from one more
    tiny aggregate; the per-token weight relation is zipf-bounded and
    AQE-broadcasts into the occurrence join; the only corpus-sized
    shuffle is the final doc-keyed re-aggregate. Nothing vocabulary-
    sized ever visits the driver. Smoothing guarantees every corpus
    token has a weight, so the occurrence join is inner with no OOV
    branch (tokens outside the training corpus can only appear when
    scoring a DIFFERENT corpus — not this entry point's contract)."""
    toked = df.select(F.col(id_col).alias("id"),
                      positive.alias("_pos"),
                      tokens(text_col).alias("_toks"))
    exploded = toked.select("id", "_pos", F.explode("_toks").alias("tok"))
    counts = (exploded.groupBy("tok")
              .agg(F.sum(F.when(F.col("_pos"), 1).otherwise(0))
                   .alias("cp"),
                   F.sum(F.when(F.col("_pos"), 0).otherwise(1))
                   .alias("cn")))
    totals = counts.agg(F.sum("cp").alias("np"),
                        F.sum("cn").alias("nn"),
                        F.count("*").alias("v"))
    a = F.lit(float(alpha))
    # evaluation-order-mirrored in the oracle SQL: IEEE doubles agree
    # across engines only when the operation tree does
    logodds = F.round(
        F.log2((F.col("cp").cast("double") + a)
               / (F.col("np").cast("double") + a * F.col("v")))
        - F.log2((F.col("cn").cast("double") + a)
                 / (F.col("nn").cast("double") + a * F.col("v"))),
        round_digits).cast("decimal(28,10)")
    weights = (counts.crossJoin(F.broadcast(totals))
               .select("tok", logodds.alias("s")))
    # the weight relation is the TOKEN VOCABULARY (zipf-bounded — even
    # the adversarial 100× replica with per-copy token suffixes holds
    # ~3k distinct tokens) and must be broadcast EXPLICITLY: the
    # occurrence side is an explode, whose size estimate stays at the
    # pre-explode scan bytes, so the static planner otherwise picks
    # the 75M-row exploded side as the broadcast build (measured 20×
    # slower at the 100× replica)
    return (exploded.join(F.broadcast(weights), "tok")
            .groupBy("id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("s").alias("_sum"))
            .select("id",
                    F.col("n_tokens").cast("bigint").alias("n_tokens"),
                    F.col("_sum").cast("decimal(38,10)")
                     .alias("sum_logodds"),
                    # double mean for humans/filters; not the value the
                    # oracle compares (round-on-double sits an ulp
                    # apart across engines at exact .5 expansions)
                    (F.col("_sum").cast("double") / F.col("n_tokens"))
                     .alias("mean_logodds")))


def nb_quality_weights(
    df: DataFrame, text_col: str, positive: Column,
    alpha: float = 1.0, round_digits: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Train once, score increments — the deployment split of
    :func:`nb_quality_scores` (same discipline as the persisted
    MinHash signature / winnow fingerprint corpora and the BPE
    train→apply pair): returns ``(weights, oov)`` where ``weights`` is
    the (tok, s) per-token log-odds relation (vocabulary-sized —
    persist it as parquet once) and ``oov`` is the 1-row relation
    carrying the log-odds of a token UNSEEN at training time (the
    Laplace-smoothed zero-count ratio — a constant, but a relation so
    nothing ever leaves the cluster). Both carry the identical
    probability tree as the one-shot entry point, so scoring the
    training corpus with them reproduces :func:`nb_quality_scores`
    bit-for-bit."""
    toked = df.select(positive.alias("_pos"),
                      tokens(text_col).alias("_toks"))
    exploded = toked.select("_pos", F.explode("_toks").alias("tok"))
    counts = (exploded.groupBy("tok")
              .agg(F.sum(F.when(F.col("_pos"), 1).otherwise(0))
                   .alias("cp"),
                   F.sum(F.when(F.col("_pos"), 0).otherwise(1))
                   .alias("cn")))
    totals = counts.agg(F.sum("cp").alias("np"),
                        F.sum("cn").alias("nn"),
                        F.count("*").alias("v"))
    a = F.lit(float(alpha))

    def _lo(cp, cn):
        return F.round(
            F.log2((cp + a) / (F.col("np").cast("double")
                               + a * F.col("v")))
            - F.log2((cn + a) / (F.col("nn").cast("double")
                                 + a * F.col("v"))),
            round_digits).cast("decimal(28,10)")

    weights = (counts.crossJoin(F.broadcast(totals))
               .select("tok", _lo(F.col("cp").cast("double"),
                                  F.col("cn").cast("double"))
                       .alias("s")))
    oov = totals.select(_lo(F.lit(0.0), F.lit(0.0)).alias("oov_s"))
    return weights, oov


def nb_score_documents(
    batch: DataFrame, weights: DataFrame, oov: DataFrame,
    text_col: str, id_col: str,
) -> DataFrame:
    """Score an increment against persisted :func:`nb_quality_weights`
    — (id, n_tokens, sum_logodds, mean_logodds), tokens unseen at
    training time falling back to the OOV log-odds. One batch explode,
    one broadcast weight join (vocabulary-sized by zipf — forced, the
    explode side's size estimate lies), one doc-keyed re-aggregate;
    the standing corpus is never touched, which is the point."""
    exploded = batch.select(F.col(id_col).alias("id"),
                            F.explode(tokens(text_col)).alias("tok"))
    return (exploded.join(F.broadcast(weights), "tok", "left")
            .crossJoin(F.broadcast(oov))
            .select("id", F.coalesce(F.col("s"), F.col("oov_s"))
                    .alias("s"))
            .groupBy("id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("s").alias("_sum"))
            .select("id",
                    F.col("n_tokens").cast("bigint").alias("n_tokens"),
                    F.col("_sum").cast("decimal(38,10)")
                     .alias("sum_logodds"),
                    (F.col("_sum").cast("double") / F.col("n_tokens"))
                     .alias("mean_logodds")))


def nb_quality_filter(
    df: DataFrame, text_col: str, id_col: str, positive: Column,
    threshold: float = 0.0, alpha: float = 1.0,
) -> DataFrame:
    """Keep documents whose mean NB log-odds ≥ ``threshold`` — the
    deployable filter around :func:`nb_quality_scores` (same plan plus
    one broadcast-friendly semi join back to the full rows)."""
    keep = (nb_quality_scores(df, text_col, id_col, positive, alpha)
            .where(F.col("mean_logodds") >= F.lit(float(threshold)))
            .select(F.col("id").alias(id_col)))
    return df.join(keep, id_col, "left_semi")


def perplexity_buckets(
    df: DataFrame, text_col: str, id_col: str,
    n_buckets: int = 3, discount: float = 0.75, keys: str = "exact",
    broadcast_stats: bool = False,
) -> DataFrame:
    """CCNet's perplexity partition (arXiv:1911.00359 §4.3): rank the
    corpus by per-document LM surprisal and cut it into ``n_buckets``
    equal-population tiers — CCNet keeps "head" (most fluent third
    under the LM), treats "middle" as usable and drops or down-weights
    "tail". The LM is the corpus's own interpolated Kneser–Ney bigram
    model (:func:`..textstats.kneser_ney_bigrams` — CCNet uses a
    pretrained KenLM; self-scoring keeps the operator closed over the
    relation and every count oracle-replayable).

    Returns ``(id, n_bigrams, mean_units, rank, bucket)`` for every
    document with ≥ 2 tokens: ``mean_units`` is the mean surprisal in
    integer MICRO-BIT units — the per-bigram surprisal is rounded to
    6 decimals, so the DECIMAL surprisal sum times 1e6 is exactly
    integral (recovered via an exact ``decimal(20,6)`` re-cast: both
    factor types stay inside precision 38, no Spark precision-loss
    rounding), and the int64/int64 mean goes through one IEEE double
    division + floor, which every engine computes identically —
    ``rank`` the 1-based global row number under
    ``(mean_units ASC, id ASC)`` (lowest surprisal = most fluent =
    rank 1) and ``bucket`` the 1-based NTILE tier (1 = head).

    Scale: the KN scoring keeps its one-explode/zipf-aggregate shape;
    the ranking is the two-stage range-partitioned construction
    (:func:`..ranking.global_rank_with_total` — NO single-partition
    window; the corpus-sized relation shuffles once on the sort key)
    and the tier cut is :func:`..ranking.ntile_expr` arithmetic on the
    rank, bit-equal to SQL ``NTILE`` with no further data movement."""
    from db2pq_spark.operators.ranking import (
        global_rank_with_total, ntile_expr)
    from db2pq_spark.operators.textstats import kneser_ney_bigrams

    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets={n_buckets} must be >= 1")
    # keys/broadcast_stats forward to the LM scorer: the gate pins
    # keys="exact" (string keys + decimal accumulation — DuckDB
    # replays rank and tier bit-for-bit); production runs keys="hash"
    # + broadcast_stats=True (xxhash64 long keys, stats broadcast —
    # the q121 production configuration, ~10x at the 100x replica;
    # a 64-bit collision merges two bigram types' statistics, which
    # perturbs a scoring signal, not a correctness contract)
    scored = kneser_ney_bigrams(df, text_col, id_col,
                                discount=discount, keys=keys,
                                broadcast_stats=broadcast_stats)
    # exact integer mean in micro-bits: every per-bigram surprisal is
    # rounded to 6 decimals before the decimal accumulation, so the
    # doc sum has at most 6 decimal places — the decimal(20,6) cast is
    # exact (values ~1e4 bits fit), the ×1e6 product stays at
    # precision 27 (no Spark precision-loss rounding), and the result
    # is exactly integral. int64/int64 through ONE double division +
    # floor is IEEE-deterministic (sums < 2^53), so the oracle's
    # FLOOR(sum_units / n) replays the key bit-for-bit.
    units_total = (F.col("sum_surprisal").cast("decimal(20,6)")
                   * F.lit(1_000_000).cast("decimal(7,0)")) \
        .cast("bigint")
    mean = scored.select(
        "id", "n_bigrams",
        F.floor(units_total / F.col("n_bigrams")).cast("bigint")
        .alias("mean_units"))
    ranked, total = global_rank_with_total(
        mean, [F.col("mean_units").asc(), F.col("id").asc()],
        rank_col="rank")
    if total == 0:
        return ranked.select("id", "n_bigrams", "mean_units", "rank",
                             F.lit(None).cast("bigint").alias("bucket"))
    return ranked.select(
        "id", "n_bigrams", "mean_units", "rank",
        ntile_expr(F.col("rank"), total, int(n_buckets))
        .cast("bigint").alias("bucket"))


def token_mi(
    df: DataFrame, text_col: str, id_col: str, positive: Column,
    k: int = 30, round_digits: int = 6,
) -> DataFrame:
    """Mutual-information feature selection (the classic text-
    classification feature ranker — Manning, Raghavan & Schütze, IIR
    §13.5.1): rank tokens by I(presence; label) over documents,

        I = Σ_{e_t∈{0,1}, e_c∈{0,1}} (n_ec/N) · log2(n_ec·N / (n_e·n_c)),

    zero-count cells contributing 0. The tokens that most separate
    the seed from the rest — the diagnostic complement of the NB/
    logreg scorers (what IS the classifier keying on), and the
    vocabulary a production filter would restrict its features to.

    Returns the top-``k`` ``(tok, n11, n10, n01, n00, mi)`` by
    (mi desc, tok asc) — mi rounded to ``round_digits`` so the order
    is a cross-engine total one; counts are exact int64 (document
    PRESENCE — a token twice in one doc counts once).

    Shape: one corpus explode → per-doc distinct (in-row
    array_distinct, before the explode — no corpus-sized distinct
    shuffle) → one zipf-bounded token aggregate with conditional
    partials → broadcast 1-row totals → TakeOrdered top-k. All the
    established plan shapes; the only corpus-sized shuffle is the
    token aggregate."""
    from db2pq_spark.operators.textstats import tokens

    base = df.select(F.col(id_col).alias("id"),
                     positive.cast("int").alias("_y"),
                     F.array_distinct(tokens(text_col)).alias("_tks"))
    pres = base.select("id", "_y", F.explode("_tks").alias("tok"))
    counts = (pres.groupBy("tok")
              .agg(F.sum("_y").alias("n11"),
                   F.sum(F.lit(1) - F.col("_y")).alias("n10")))
    totals = base.agg(F.count("*").alias("nn_total"),
                      F.sum("_y").alias("np_total"))

    def _term(nij: Column, ne: Column, nc: Column, n: Column) -> Column:
        # (nij/N) * log2(nij*N / (ne*nc)); 0 when the cell is empty
        return F.when(nij > 0,
                      (nij.cast("double") / n.cast("double"))
                      * F.log2((nij * n).cast("double")
                               / (ne * nc).cast("double"))) \
            .otherwise(F.lit(0.0))

    n = F.col("nn_total")
    npos = F.col("np_total")
    n11, n10 = F.col("n11"), F.col("n10")
    n01 = npos - n11
    n00 = n - npos - n10
    n1_ = n11 + n10
    n0_ = n - n1_
    mi = F.round(
        _term(n11, n1_, npos, n) + _term(n10, n1_, n - npos, n)
        + _term(n01, n0_, npos, n) + _term(n00, n0_, n - npos, n),
        round_digits)
    return (counts.crossJoin(F.broadcast(totals))
            .select("tok", F.col("n11").cast("bigint"),
                    F.col("n10").cast("bigint"),
                    n01.cast("bigint").alias("n01"),
                    n00.cast("bigint").alias("n00"),
                    mi.alias("mi"))
            .orderBy(F.desc("mi"), F.asc("tok"))
            .limit(int(k)))


def token_drift(
    standing: DataFrame, batch: DataFrame, text_col: str,
    alpha: float = 1.0, k: int = 30, round_digits: int = 6,
) -> DataFrame:
    """Corpus-drift detection between a standing corpus and a new
    crawl batch — the distribution-shift QA gate run before a batch
    is admitted (CCNet-style pipelines monitor exactly this between
    crawl snapshots): per-token KL-divergence contribution

        kl_term(t) = p_B(t) · log2( p_B(t) / p_A(t) ),

    under Laplace-``alpha`` smoothing over the UNION vocabulary
    (``p_X(t) = (cnt_X(t) + α)/(N_X + α·V)`` — every union token has
    both probabilities, so no zero branch exists), where A is the
    standing corpus and B the batch. ``Σ_t kl_term = KL(B‖A)``; the
    top contributors ARE the drift diagnosis (which tokens exploded
    or vanished).

    Returns the top-``k`` ``(tok, cnt_a, cnt_b, kl_term)`` by
    (|kl_term| desc, tok asc) — negative terms (tokens
    under-represented in the batch) matter for the diagnosis too,
    hence the absolute ranking; ``kl_term`` rounded to
    ``round_digits`` so the order is a cross-engine total one.

    Shape: one explode + token aggregate per side, one full-outer
    union-vocabulary merge (both relations zipf-bounded), broadcast
    1-row totals, TakeOrdered top-k. Engines agree wherever their
    log2 doubles agree (the established stance)."""
    from db2pq_spark.operators.textstats import tokens

    ca = (standing.select(F.explode(tokens(text_col)).alias("tok"))
          .groupBy("tok").agg(F.count("*").alias("cnt_a")))
    cb = (batch.select(F.explode(tokens(text_col)).alias("tok"))
          .groupBy("tok").agg(F.count("*").alias("cnt_b")))
    return token_drift_counts(ca, cb, alpha=alpha, k=k,
                              round_digits=round_digits)


def token_drift_counts(
    ca: DataFrame, cb: DataFrame,
    alpha: float = 1.0, k: int = 30, round_digits: int = 6,
) -> DataFrame:
    """:func:`token_drift` over pre-aggregated token counts —
    ``ca (tok, cnt_a)`` for the standing corpus, ``cb (tok, cnt_b)``
    for the batch. This is the streaming-monitor entry point
    (:func:`db2pq_spark.streaming.drift.stream_token_drift` keeps
    ``ca`` as a persisted rollup and never re-reads the corpus);
    :func:`token_drift` is the from-text convenience wrapper. Same
    smoothing, ranking and rounding."""
    merged = (ca.join(cb, "tok", "full_outer")
              .select("tok",
                      F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                      F.coalesce("cnt_b", F.lit(0)).alias("cnt_b")))
    totals = merged.agg(F.sum("cnt_a").alias("na"),
                        F.sum("cnt_b").alias("nb"),
                        F.count("*").alias("v"))
    a = F.lit(float(alpha))
    pa = (F.col("cnt_a").cast("double") + a) \
        / (F.col("na").cast("double") + a * F.col("v"))
    pb = (F.col("cnt_b").cast("double") + a) \
        / (F.col("nb").cast("double") + a * F.col("v"))
    term = F.round(pb * F.log2(pb / pa), round_digits)
    return (merged.crossJoin(F.broadcast(totals))
            .select("tok", F.col("cnt_a").cast("bigint"),
                    F.col("cnt_b").cast("bigint"),
                    term.alias("kl_term"))
            .orderBy(F.abs(F.col("kl_term")).desc(), F.asc("tok"))
            .limit(int(k)))
