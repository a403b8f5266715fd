"""Maximal Marginal Relevance (MMR) diversified selection.

Carbonell & Goldstein, *The Use of MMR, Diversity-Based Reranking for
Reordering Documents and Producing Summaries* (SIGIR 1998): pick k
items that are RELEVANT to a query but not redundant with each other,

    next = argmax_{v ∉ S} [ λ·rel(v) − (1−λ)·max_{s∈S} sim(v, s) ],

the standard diversification step in retrieval pipelines and in
"pick k diverse exemplars" data-selection recipes (e.g. seeding
few-shot pools or dedup-aware eval subsets from an embedding corpus).

Reference repo has no vector surface (ETL/sync only,
``/root/reference/README.md:1-17``); [extension] per the driver
charter.

Scale shape — the k-means/BPE iteration discipline: the selection is
inherently sequential in k, so each of the k rounds is ONE narrow
corpus pass (cosine folds against the ≤k selected vectors, broadcast
as literals — k·d doubles) ending in a TakeOrdered LIMIT-1 and a
1-row driver collect. Nothing corpus-sized ever shuffles or visits
the driver; cost is k scans, the right trade for the small k (4–32)
MMR is used with. Determinism: per-pair cosines are rounded to
``round_digits`` before the max/score arithmetic and ties break on
the lower id, so the trajectory is engine-replayable (the q128 oracle
unrolls the rounds as CTEs)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db2pq_spark.operators.similarity import cosine, cosine_null_safe

#: hard cap on ``k``: every already-selected vector is inlined into the
#: round-r score expression as literal arrays, so plan size is O(k·d)
#: literals per round (O(k²·d) through analysis over the whole run) —
#: the right trade for the 4–32-exemplar selections MMR is used with,
#: pathological at k≈500 (same bounded-contract discipline as
#: ranking.global_rank_with_total's `bounded` check).
MMR_MAX_K = 128


def mmr_select(
    df: DataFrame, vec_col: str, id_col: str, query_vec,
    k: int = 4, lam: float = 0.5, round_digits: int = 4,
) -> DataFrame:
    """(rank, id, relevance, score) — the k MMR-selected rows of
    ``df``. ``query_vec`` is a plain Python/numpy vector (relevance =
    rounded cosine against it); ``lam`` trades relevance against
    novelty (0.5 = the gate-exactness default — exactly representable,
    so the score arithmetic replays bit-for-bit; the classic paper
    range is 0.3–0.7).

    Each round evaluates ``λ·rel − (1−λ)·max_{s∈S} cos(v, s)`` with
    the selected vectors inlined as literal arrays, takes the global
    argmax via orderBy+LIMIT 1 (TakeOrderedAndProject — no global
    sort) and collects ONE row; the selected set lives driver-side
    (≤ k·d doubles, the k-means centroid discipline)."""
    if int(k) > MMR_MAX_K:
        raise ValueError(
            f"k={k} exceeds MMR_MAX_K={MMR_MAX_K}: mmr_select inlines "
            "every selected vector into the score expression as "
            "literals (O(k·d) per round through plan analysis) — the "
            "right trade only for small exemplar selections; for "
            "large k use a clustering-based selector "
            "(operators/clustering.py) instead")
    if not any(float(x) != 0.0 for x in query_vec):
        raise ValueError("query_vec has zero norm — relevance cosine "
                         "is undefined")
    spark = df.sparkSession
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    rel = F.round(cosine_null_safe(F.col(vec_col), qlit), round_digits)
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("_v"), rel.alias("rel"))
    # A zero-norm candidate is poison: under ANSI (Spark 4 default)
    # its cosine raises DIVIDE_BY_ZERO mid-query; under legacy mode it
    # is NaN, which sorts ABOVE every double descending — it would win
    # round 1 and then NaN every later round's max-sim term. rel is
    # NULL (try_divide) exactly when |v| = 0 (query norm checked
    # above); drop those rows before any argmax. Surviving candidates
    # all have positive norm, so the round-r cosines against selected
    # vectors are plain divisions again.
    base = base.where(F.col("rel").isNotNull())
    lam_c, inv_c = F.lit(float(lam)), F.lit(1.0) - F.lit(float(lam))
    selected: list[tuple] = []   # (rank, id, vec, rel, score)
    for r in range(int(k)):
        if selected:
            maxsim = F.greatest(*[
                F.round(cosine(F.col("_v"),
                               F.array(*[F.lit(float(x)) for x in vec])),
                        round_digits)
                for _, _, vec, _, _ in selected]) \
                if len(selected) > 1 else \
                F.round(cosine(F.col("_v"),
                               F.array(*[F.lit(float(x))
                                         for x in selected[0][2]])),
                        round_digits)
        else:
            maxsim = F.lit(0.0)
        score = lam_c * F.col("rel") - inv_c * maxsim
        cand = base
        if selected:
            cand = cand.where(~F.col("id").isin(
                [s[1] for s in selected]))
        row = (cand.select("id", "_v", "rel", score.alias("score"))
               .orderBy(F.desc("score"), F.asc("id"))
               .limit(1).collect())
        if not row:
            break
        row = row[0]
        selected.append((r + 1, row["id"], list(row["_v"]),
                         float(row["rel"]), float(row["score"])))
    return spark.createDataFrame(
        [(s[0], s[1], s[3], s[4]) for s in selected],
        "rank bigint, id bigint, relevance double, score double")
