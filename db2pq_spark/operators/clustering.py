"""Deterministic, engine-replayable Lloyd's k-means.

[extension — not in the reference] :func:`..similarity.ivf_topk` trains
its coarse quantizer with ``pyspark.ml.KMeans`` — fast, but its random
init and float reductions make the centroids unverifiable against any
other engine. This module is the oracle-able twin: every arithmetic
step follows the workload's cross-engine determinism rules, so a fixed
iteration count produces bit-identical centroids in Spark and DuckDB
(the q117 gate hash-verifies them):

- init: the ``k`` lowest-id vectors (a total order — no RNG);
- distances: per-dimension squared differences are doubles computed
  from identical operands, accumulated as exact ``DECIMAL(28,10)`` —
  order-independent sums, so the argmin comparisons see identical
  values in every engine (the ``dsum`` convention applied to
  distances);
- assignment ties broken by cluster id;
- centroid update: per-(cluster, dim) decimal-sum / count means (the
  :func:`..similarity.label_centroids` rule), rounded to a fixed scale
  so the next iteration's operands are identical doubles everywhere.

Scale shape per iteration: centroids are a k-row broadcast; assignment
is one narrow crossJoin + per-id min (one key shuffle); the update is
posexplode → (cluster, dim) partial+final aggregate (tiny). The ONLY
driver materialization is the k×dim centroid matrix per iteration — a
bounded fold, same class as the mixing/ranking folds. Iteration count
is fixed (a hyperparameter, not a convergence loop): training-data
pipelines want reproducible quantizers, and a bounded plan — pass more
``iterations`` for tighter centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assign", "prototype_prune",
           "kmeans_sql_chain"]

#: decimal type for exact, order-independent distance / mean sums.
#: SUM over (28,10) terms yields (38,10) in both Spark and DuckDB —
#: identical exact values, so the argmin comparisons agree. (A
#: fold-based accumulation is NOT usable here: Spark's decimal
#: addition widens (38,10)+(28,10) to (38,9) — a silent scale drop —
#: so distances go through a grouped SUM instead.)
_DEC = "decimal(28,10)"


def kmeans_assign(df: DataFrame, centroids: list[list[float]],
                  vec_col: str, id_col: str) -> DataFrame:
    """(id, vec, cluster): each vector labeled with its nearest
    centroid (exact-decimal distances, ties to the lower cluster id).
    ``centroids`` is the driver-side k×dim matrix — broadcast, tiny.

    Shape: posexploded (id, dim, x) terms join the broadcast
    (cluster, dim, c) centroid dims, squared differences accumulate as
    a grouped exact-decimal SUM per (id, cluster), then one per-id
    argmin — n×k×dim narrow rows through map-side-combined aggregates,
    the same relational shape the q117 oracle replays."""
    spark = df.sparkSession
    cdims = [(ci, d, float(x))
             for ci, c in enumerate(centroids) for d, x in enumerate(c)]
    cdf = spark.createDataFrame(
        cdims, "cluster int, dim int, c double")
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("vec")) \
        .where(F.col(vec_col).isNotNull())
    terms = (
        base.select("id", F.posexplode("vec").alias("dim", "_x"))
        .join(F.broadcast(cdf), "dim")
        .select("id", "cluster",
                ((F.col("_x").cast("double") - F.col("c"))
                 * (F.col("_x").cast("double") - F.col("c")))
                .cast(_DEC).alias("_t"))
    )
    d2 = terms.groupBy("id", "cluster").agg(F.sum("_t").alias("_d2"))
    return (
        d2.groupBy("id")
        .agg(F.min(F.struct("_d2", "cluster")).alias("_m"))
        .select("id", F.col("_m.cluster").alias("cluster"))
        .join(base, "id")
        .select("id", "vec", "cluster")
    )


def kmeans_assign_arrow(df: DataFrame, centroids: list[list[float]],
                        vec_col: str, id_col: str) -> DataFrame:
    """Arrow-batched assignment: one NumPy distance matrix per batch
    (||x||² − 2xCᵀ + ||c||², argmin per row) against the broadcast
    k×dim centroid matrix — the production path (BLAS speed, no
    explode, no shuffle at all: assignment is fully narrow).

    Same labels as :func:`kmeans_assign` except where a point is
    near-equidistant between two centroids: BLAS sums in a different
    floating-point order than the exact-decimal relational path, so
    boundary ties can resolve differently (ties break to the lower
    cluster id in both). Use the exact path when cross-engine
    verifiability matters; this one when throughput does."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import (LongType, StructField, StructType)

    C = np.asarray(centroids, dtype=np.float64)          # (k, dim)
    c2 = (C * C).sum(axis=1)                             # (k,)
    # vec rides THROUGH the Arrow batch (id, vec, cluster) — an earlier
    # shape returned (id, cluster) only and re-joined the corpus to
    # resurrect vec, i.e. one full-embedding shuffle per Lloyd
    # iteration; carrying the column keeps assignment truly narrow
    out_schema = StructType(df.select(id_col, vec_col).schema.fields
                            + [StructField("cluster", LongType())])

    def assign(batches):
        for pdf in batches:
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]]) if len(pdf) else \
                np.zeros((0, C.shape[1]))
            # argmin over ||v||^2 - 2 v.C^T + ||c||^2; ||v||^2 is
            # row-constant so it can't change the argmin — drop it
            d = -2.0 * (V @ C.T) + c2
            yield type(pdf)({id_col: pdf[id_col],
                             vec_col: pdf[vec_col],
                             "cluster": d.argmin(axis=1)})

    base = df.select(id_col, vec_col) \
        .where(F.col(vec_col).isNotNull())
    return (base.mapInPandas(assign, schema=out_schema)
            .select(F.col(id_col).alias("id"),
                    F.col(vec_col).alias("vec"),
                    F.col("cluster").cast("int").alias("cluster")))


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    round_scale: int = 9,
    impl: str = "exact",
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iterations`` Lloyd rounds; return ``(assignments,
    centroids)`` — the labeled corpus relation (id, vec, cluster) under
    the FINAL centroids, plus the k×dim centroid matrix.

    ``impl="exact"`` (default) is the engine-replayable configuration
    (decimal distance sums — the q117 oracle's contract);
    ``impl="arrow"`` assigns via :func:`kmeans_assign_arrow` (BLAS,
    fully narrow; the update step is unchanged) — the production
    trainer, same quality, not bit-replayable cross-engine (boundary
    ties can assign differently).

    Empty clusters keep their previous centroid (documented; with
    lowest-id init and real data this is rare). See module docstring
    for the determinism contract and scale shape."""
    if impl not in ("exact", "arrow"):
        raise ValueError(f"unknown kmeans impl {impl!r}")
    assign = kmeans_assign if impl == "exact" else kmeans_assign_arrow
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("vec")) \
        .where(F.col(vec_col).isNotNull())
    init = base.orderBy("id").limit(k).collect()  # bounded: k rows
    centroids = [[float(x) for x in r["vec"]] for r in init]

    for _ in range(iterations):
        assigned = assign(base, centroids, "vec", "id")
        means = (
            assigned.select("cluster",
                            F.posexplode("vec").alias("dim", "_x"))
            .groupBy("cluster", "dim")
            .agg(F.sum(F.col("_x").cast("double").cast(_DEC)).alias("_s"),
                 F.count("*").alias("_c"))
            .select("cluster", "dim",
                    F.round(F.col("_s").cast("double") / F.col("_c"),
                            round_scale).alias("_m"))
        )
        new = (
            means.groupBy("cluster")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "_m")))
                 .alias("_o"))
            .select("cluster",
                    F.transform("_o", lambda s: s["_m"]).alias("centroid"))
            .collect()  # bounded fold: k rows x dim doubles
        )
        got = {r["cluster"]: [float(x) for x in r["centroid"]]
               for r in new}
        centroids = [got.get(ci, centroids[ci]) for ci in range(len(centroids))]

    return assign(base, centroids, "vec", "id"), centroids


def prototype_prune(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    drop: tuple[int, int] = (1, 4),
    impl: str = "exact",
) -> DataFrame:
    """SSL-prototype diversity pruning — the second half of D4
    (Sorscher et al. 2022 "Beyond neural scaling laws"; Tirumala et
    al. 2023 D4 applies it after SemDeDup): cluster the embedding
    space, rank each point by distance to its OWN centroid, and drop
    the closest ``drop = num/den`` fraction per cluster — the most
    prototypical (least informative) examples. Returns the kept rows
    as ``(id, cluster, d2, proto_rank)`` where ``proto_rank`` is the
    1-based within-cluster proximity rank (1 = most prototypical —
    always dropped first).

    Determinism: distances are the trainer's exact-decimal sums, the
    rank order (cluster, d2, id) is total, and the per-cluster drop
    count is integer arithmetic ``(n_c · num) div den`` — fully
    engine-replayable given :func:`kmeans_fit`'s contract.

    Scale: the within-cluster rank is the range-partitioned global
    rank over (cluster, d2, id) (NO per-cluster window — k is small,
    so ``partitionBy(cluster)`` would funnel the corpus into k tasks);
    per-cluster minima/counts are a k-bounded aggregate broadcast
    back. Nothing corpus-sized is collected."""
    from db2pq_spark.operators.ranking import global_rank_with_total

    num, den = (int(drop[0]), int(drop[1]))
    if not 0 <= num < den:
        raise ValueError(f"drop {drop} must satisfy 0 <= num < den")
    assigned, centroids = kmeans_fit(df, vec_col, id_col, k=k,
                                     iterations=iterations, impl=impl)
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(ci, d, float(x))
         for ci, c in enumerate(centroids) for d, x in enumerate(c)],
        "cluster int, dim int, c double")
    d2 = (assigned.select("id", "cluster",
                          F.posexplode("vec").alias("dim", "_x"))
          .join(F.broadcast(cdf), ["cluster", "dim"])
          .select("id", "cluster",
                  ((F.col("_x").cast("double") - F.col("c"))
                   * (F.col("_x").cast("double") - F.col("c")))
                  .cast(_DEC).alias("_t"))
          .groupBy("id", "cluster").agg(F.sum("_t").alias("d2")))
    ranked, _ = global_rank_with_total(
        d2, [F.col("cluster").asc(), F.col("d2").asc(),
             F.col("id").asc()], rank_col="_gr")
    stats = ranked.groupBy("cluster").agg(
        F.min("_gr").alias("_minr"), F.count("*").alias("_cn"))
    return (ranked.join(F.broadcast(stats), "cluster")
            .select("id", "cluster", "d2",
                    (F.col("_gr") - F.col("_minr") + 1).cast("bigint")
                    .alias("proto_rank"), "_cn")
            .where(F.expr(f"proto_rank > (_cn * {num}) div {den}"))
            .drop("_cn"))


def kmeans_sql_chain(tag: str, base: str, k: int, iterations: int,
                     round_scale: int = 9) -> str:
    """DuckDB CTE chain replaying :func:`kmeans_fit` (the q117 oracle,
    parameterized): ``{tag}c0`` the lowest-id init, then per round
    exact-decimal distances → argmin assignment → rounded decimal-mean
    update with empty-cluster fallback, ending with the final
    assignment ``{tag}a{iterations+1}`` joined against its distances
    ``{tag}d{iterations+1}``. ``base`` must provide (id, vec) with
    ``vec`` a DOUBLE[]."""
    ctes = [f"""
    {tag}c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cluster,
             vec AS centroid
      FROM (SELECT id, vec FROM {base} ORDER BY id LIMIT {k})
    )"""]
    for i in range(1, iterations + 2):
        ctes.append(f"""
    {tag}d{i} AS (
      SELECT b.id, c.cluster,
             SUM(CAST((b.vec[i] - c.centroid[i])
                      * (b.vec[i] - c.centroid[i])
                      AS DECIMAL(28,10))) AS d2
      FROM {base} b, {tag}c{i - 1} c,
           unnest(generate_series(1, len(b.vec))) AS t(i)
      GROUP BY b.id, c.cluster
    ),
    {tag}a{i} AS (
      SELECT id, cluster FROM (
        SELECT id, cluster,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY d2, cluster) AS rn
        FROM {tag}d{i}) WHERE rn = 1
    )""")
        if i == iterations + 1:
            break
        ctes.append(f"""
    {tag}m{i} AS (
      SELECT a.cluster, i - 1 AS dim,
             ROUND(CAST(SUM(CAST(b.vec[i] AS DECIMAL(28,10)))
                        AS DOUBLE) / COUNT(*), {round_scale}) AS m
      FROM {tag}a{i} a JOIN {base} b USING (id),
           unnest(generate_series(1, len(b.vec))) AS t(i)
      GROUP BY a.cluster, i
    ),
    {tag}c{i} AS (
      SELECT p.cluster, COALESCE(n.centroid, p.centroid) AS centroid
      FROM {tag}c{i - 1} p LEFT JOIN (
        SELECT cluster, array_agg(m ORDER BY dim) AS centroid
        FROM {tag}m{i} GROUP BY cluster) n USING (cluster)
    )""")
    return ",".join(ctes)
