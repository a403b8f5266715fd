"""Classifier evaluation — exact distributed ROC-AUC.

A trained quality filter (q153's logistic regression, q124's Naive
Bayes) is only as good as its ranking of good-vs-bad documents; the
standard scalar for that is ROC-AUC, which for a binary classifier
equals the Mann–Whitney U statistic: the probability a random positive
outranks a random negative, ties at half credit (Hanley & McNeil 1982).

The rank-sum identity makes this exactly computable in relational
algebra with NO per-pair work:

    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻)

where R⁺ is the sum of positives' average ranks under the score order.
Scores here are INTEGER (micro-unit margins), so grouping by score,
one exclusive prefix sum over the score-ordered group relation, and
doubled average ranks ``r2 = 2·prev + n + 1`` keep every quantity an
exact int64 until the single final IEEE division — engines replay the
number bit-for-bit.

Scale shape: one score-keyed aggregate (map-side combined; the group
relation is |distinct scores| ≤ corpus), the two-stage range-
partitioned prefix sum (:func:`..ranking.with_global_prefix_sum` — no
single-partition window), and a 1-row final fold. [extension — the
reference has no classifier surface; driver charter]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["roc_auc", "calibration_buckets"]


def roc_auc(df: DataFrame, score_col: str | Column,
            label: Column) -> DataFrame:
    """One row ``(n_pos, n_neg, u2, auc)``: ``u2`` is the exact
    doubled Mann–Whitney U (int64), ``auc = u2 / (2·n⁺·n⁻)`` rounded
    to 6 digits — NULL when either class is empty (AUC undefined;
    refusing beats a misleading 0.5). ``score_col`` must be integral
    (cast upstream — micro-unit margins, rank keys); ``label`` a
    boolean Column over ``df``."""
    from db2pq_spark.operators.ranking import with_global_prefix_sum

    s = F.col(score_col) if isinstance(score_col, str) else score_col
    g = (df.select(s.cast("bigint").alias("s"),
                   label.cast("int").alias("y"))
         .groupBy("s")
         .agg(F.count("*").alias("n"), F.sum("y").alias("np_s")))
    ranked = with_global_prefix_sum(g, "n", [F.col("s").asc()],
                                    out_col="_prev")
    r2 = ranked.select(
        "np_s", "n",
        (F.lit(2) * F.col("_prev") + F.col("n") + 1).alias("_r2"))
    tot = r2.agg(
        F.sum("np_s").alias("n_pos"),
        (F.sum("n") - F.sum("np_s")).alias("n_neg"),
        F.sum(F.col("np_s") * F.col("_r2")).alias("_r2pos"))
    u2 = (F.col("_r2pos")
          - F.col("n_pos") * (F.col("n_pos") + 1)).cast("bigint")
    return tot.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        u2.alias("u2"),
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               F.round(u2.cast("double")
                       / (F.lit(2.0) * F.col("n_pos")
                          * F.col("n_neg")), 6))
        .alias("auc"))


def calibration_buckets(
    df: DataFrame, prob_col: str | Column, label: Column,
    n_buckets: int = 10,
) -> DataFrame:
    """Reliability-diagram buckets + Brier decomposition input: rows
    bucketed by predicted probability (``bucket = min(floor(p·B),
    B−1)`` — one IEEE multiply + floor, identical in every engine),
    each bucket reporting ``(n, n_pos, sum_prob, mean_label,
    sum_brier)``. A well-calibrated classifier has
    ``mean_label ≈ sum_prob/n`` per bucket; ``Σ sum_brier / Σ n`` is
    the Brier score.

    Determinism: ``prob_col`` is expected already rounded (the
    logreg/NB scorers emit 6-digit probabilities); per-row squared
    errors round to 12 digits before an exact decimal accumulation
    (order-independent), ``mean_label`` is one int/int division
    rounded to 6. [extension]"""
    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets={n_buckets} must be >= 1")
    p = (F.col(prob_col) if isinstance(prob_col, str)
         else prob_col).cast("double")
    y = label.cast("int")
    b = F.least(F.floor(p * F.lit(float(n_buckets))),
                F.lit(int(n_buckets) - 1)).cast("int")
    sq = F.round((p - y.cast("double")) * (p - y.cast("double")), 12) \
        .cast("decimal(28,12)")
    return (df.select(b.alias("bucket"), y.alias("_y"),
                      p.alias("_p"), sq.alias("_sq"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.sum("_y").alias("n_pos"),
                 F.sum(F.col("_p").cast("decimal(18,6)"))
                 .alias("sum_prob"),
                 F.sum("_sq").alias("sum_brier"))
            .select("bucket", F.col("n").cast("bigint"),
                    F.col("n_pos").cast("bigint"),
                    F.col("sum_prob").cast("decimal(38,6)"),
                    F.round(F.col("n_pos").cast("double")
                            / F.col("n"), 6).alias("mean_label"),
                    F.col("sum_brier").cast("decimal(38,12)")))
