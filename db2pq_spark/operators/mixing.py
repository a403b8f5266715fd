"""Corpus mixing — weighted source composition to a size budget.

[extension — not in the reference] The last step before training-data
materialization: given per-source mixing weights (the Pile / Dolma /
DataComp recipe shape) and a total token/char budget, choose how much
of each source to keep — *down*-sampling oversized sources and
*up*-sampling (repeating, bounded) undersized high-value ones — and
emit the mixed corpus with an ``epoch`` column.

Reproducibility contract (same as :mod:`.sampling`): every decision is
a pure function of the row key and the per-source totals — no RNG
state, no partition-order dependence. The fractional part of a
source's sampling rate keeps rows whose md5 bucket clears a threshold,
so re-running over a grown corpus keeps previously chosen rows unless
the rates themselves moved.

Exactness across engines: the per-source rate is held as an INTEGER
number of bucket-units (``units = target_size * n_buckets //
available_size``), so full-epoch counts (``units // n_buckets``) and
the fractional threshold (``units % n_buckets``) involve no float
comparison anywhere near a row decision — DuckDB/Trino replicate the
arithmetic bit-for-bit (the q109 oracle does), and the only float step
(``floor(budget * w / total_w)``) is IEEE-754 double multiply/divide,
identical in every engine.

Scale shape: one map-side-combined aggregate collapses the corpus to
one row per source (driver fold bounded by the source vocabulary, like
the ranking offsets); decisions then apply as a narrow
broadcast-join + filter + bounded ``explode(sequence)`` — the corpus
shuffles zero times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db2pq_spark.operators.sampling import (
    DEFAULT_BUCKETS,
    hash_bucket,
    hash_bucket_sql,
)

__all__ = ["mix_plan", "mix_corpus", "mix_report", "mix_units_sql",
           "mix_frac_keep_sql", "select_until_budget"]


def mix_plan(
    df: DataFrame,
    source_col: str,
    size_col: str,
    weights: dict[str, float],
    budget: int,
    max_epochs: int = 4,
    n_buckets: int = DEFAULT_BUCKETS,
) -> list[tuple[str, int, int, int]]:
    """Resolve per-source sampling decisions:
    ``[(source, full_epochs, frac_threshold, available_size), ...]``.

    ``weights`` are relative (normalized internally); sources absent
    from the map are dropped, weighted sources absent from the data are
    ignored. A source's target is ``floor(budget * w / total_w)``; its
    rate in integer bucket-units is ``target * n_buckets // available``
    capped at ``max_epochs`` epochs (upsampling a tiny source hundreds
    of times would just clone boilerplate — cap and let the caller
    re-weight). The driver-side fold is one row per source (bounded
    vocabulary, same discipline as the ranking offset fold)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("mixing weights must sum to a positive number")
    if any(w < 0 for w in weights.values()):
        raise ValueError("mixing weights must be non-negative")
    avail = {
        r["s"]: r["sz"]
        for r in df.groupBy(F.col(source_col).alias("s"))
                   .agg(F.sum(F.col(size_col).cast("bigint")).alias("sz"))
                   .collect()
    }
    plan = []
    for source, w in weights.items():
        a = avail.get(source)
        if not a or a <= 0:
            continue
        target = int(float(budget) * w / total_w)  # floor; exact in SQL
        units = min(target * n_buckets // a, max_epochs * n_buckets)
        plan.append((source, int(units // n_buckets),
                     int(units % n_buckets), int(a)))
    return plan


def mix_corpus(
    df: DataFrame,
    source_col: str,
    size_col: str,
    id_col: str,
    weights: dict[str, float],
    budget: int,
    salt: str = "",
    max_epochs: int = 4,
    n_buckets: int = DEFAULT_BUCKETS,
    epoch_col: str = "epoch",
) -> DataFrame:
    """The mixed corpus: every input column plus ``epoch`` (0-based).

    A row of source s with rate ``full + frac/n_buckets`` appears in
    epochs ``0 .. full-1`` unconditionally and in epoch ``full`` iff
    its salted md5 bucket is below the fractional threshold. Rows of
    unweighted sources (and sources rated to zero) disappear.

    Plan: broadcast the (tiny) per-source decision table, one filter,
    one ``explode(sequence(0, copies-1))`` whose fan-out is bounded by
    ``max_epochs`` — narrow end-to-end; the corpus never shuffles."""
    plan = mix_plan(df, source_col, size_col, weights, budget,
                    max_epochs, n_buckets)
    spark = df.sparkSession
    if not plan:
        return (df.withColumn(epoch_col, F.lit(0).cast("bigint"))
                  .where(F.lit(False)))
    rates = spark.createDataFrame(
        [(s, fe, ft) for s, fe, ft, _ in plan],
        f"`{source_col}` string, _full int, _frac int")
    copies = (
        F.col("_full")
        + F.when(hash_bucket(id_col, n_buckets, salt) < F.col("_frac"),
                 1).otherwise(0)
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .withColumn("_copies", copies)
        .where(F.col("_copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0).cast("bigint"),
                                 (F.col("_copies") - 1).cast("bigint"))))
        .drop("_full", "_frac", "_copies")
    )


def mix_report(
    mixed: DataFrame, source_col: str, size_col: str, id_col: str,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Achieved composition of a :func:`mix_corpus` output: per source,
    ``n_rows`` (row-epochs emitted), ``n_distinct_rows`` (distinct
    documents — ``n_rows / n_distinct_rows`` is the achieved
    duplication factor), ``n_epochs``, ``achieved_size`` (size column
    summed over emitted row-epochs) and ``share`` of the emitted total
    — the audit table you compare against the requested weights. One
    aggregate + a broadcast total. ``epoch_col`` must match the name
    given to :func:`mix_corpus`."""
    per = mixed.groupBy(source_col).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(id_col).alias("n_distinct_rows"),
        F.countDistinct(epoch_col).alias("n_epochs"),
        F.sum(F.col(size_col).cast("bigint")).alias("achieved_size"),
    )
    total = per.agg(F.sum("achieved_size").alias("_t"))
    return (per.crossJoin(F.broadcast(total))
            .withColumn("share",
                        F.round(F.col("achieved_size") / F.col("_t"), 6))
            .drop("_t"))


def mix_units_sql(
    source_expr: str,
    size_sum_expr: str,
    weights: dict[str, float],
    budget: int,
    max_epochs: int = 4,
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """ANSI twin of the rate arithmetic in :func:`mix_plan`: a CASE
    expression yielding the integer bucket-units for ``source_expr``
    given ``size_sum_expr`` (the source's total size). Used by the
    oracles; NULL for unweighted sources."""
    total_w = float(sum(weights.values()))
    # Two portability traps the property suite guards
    # (tests/test_properties.py::TestMixingArithmeticProperties):
    # - plain numeric literals parse as DECIMAL in ANSI engines, and
    #   BOTH decimal arithmetic AND the decimal→double cast diverge
    #   from Python's float64 by an ulp (measured: the cast computes
    #   mantissa/10^scale as a double division, not strtod) — so
    #   literals are emitted in E-notation, which parses directly as
    #   DOUBLE via strtod and round-trips repr() exactly;
    # - the target × n_buckets product can exceed int64 for data-scale
    #   budgets (Python's bigints are exact) — the multiply runs in
    #   HUGEINT (int128) and the capped result (≤ max_epochs ×
    #   n_buckets) casts back losslessly.
    def dbl(x: float) -> str:
        r = repr(float(x))
        return r if ("e" in r or "E" in r) else f"{r}e0"

    # source names come from data/metadata — escape single quotes so a
    # quoted (or malicious) name can't break out of the SQL literal,
    # and parenthesize the // denominator so a compound size_sum_expr
    # keeps its intended precedence
    arms = " ".join(
        f"WHEN {source_expr} = '{s.replace(chr(39), chr(39) * 2)}' "
        f"THEN CAST(least("
        f"(CAST(floor({dbl(budget)} * {dbl(w)} / {dbl(total_w)}) "
        f"AS HUGEINT) * {n_buckets}) // ({size_sum_expr}), "
        f"{max_epochs * n_buckets}) AS BIGINT)"
        for s, w in weights.items())
    return f"CASE {arms} ELSE NULL END"


def mix_frac_keep_sql(key_expr: str, frac_expr: str, salt: str = "",
                      n_buckets: int = DEFAULT_BUCKETS) -> str:
    """ANSI twin of the fractional-epoch keep decision."""
    return f"({hash_bucket_sql(key_expr, n_buckets, salt)} < {frac_expr})"


def select_until_budget(
    df: DataFrame,
    score_col: str,
    size_col: str,
    id_col: str,
    budget: int,
    bounded: int | None = None,
) -> DataFrame:
    """Quality-ordered budget selection: rank every document by
    ``(score desc, id asc)`` — a total order — and admit the prefix
    that fits the budget: a document is **kept** iff the exclusive
    cumulative size before it plus its own size is ``<= budget``
    (greedy best-first admission, the standard "fill the token budget
    with the best data" curation step; DataComp/Dolma-style). The
    global complement of :func:`mix_corpus`, which apportions a budget
    ACROSS sources by weight rather than by per-document quality.

    Returns ``(id, score, size, rank, cum_before, kept)`` for every
    input row, so callers can inspect the admission frontier;
    membership is decided by exact integer comparison on bigint sizes
    — no float near the decision.

    Scale: the relation is corpus-sized but SKINNY (id, score, size);
    the global rank and the exclusive prefix sum both run the
    two-stage range-partitioned construction in
    :mod:`db2pq_spark.operators.ranking` — one range shuffle each, a
    driver fold over ≤ shuffle-partition-count longs, and NO
    single-partition window at any size (``bounded`` opts into the
    one-partition fast path for capped inputs). Ties on score break
    by id, so reruns and engines agree row-for-row."""
    from db2pq_spark.operators.ranking import (
        with_global_prefix_sum, with_global_rank)

    if int(budget) < 0:
        raise ValueError(f"budget={budget} must be >= 0")
    sel = df.select(F.col(id_col).alias("id"),
                    F.col(score_col).alias("score"),
                    F.col(size_col).cast("bigint").alias("size"))
    order = [F.desc("score"), F.asc("id")]
    with_cum = with_global_prefix_sum(
        sel, "size", order, out_col="cum_before", bounded=bounded)
    ranked = with_global_rank(with_cum, order, rank_col="rank",
                              bounded=bounded)
    return ranked.select(
        "id", "score", "size",
        F.col("rank").cast("bigint").alias("rank"),
        F.col("cum_before").cast("bigint").alias("cum_before"),
        ((F.col("cum_before") + F.col("size")) <= F.lit(int(budget)))
        .alias("kept"))
