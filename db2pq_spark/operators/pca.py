"""Embedding second-moment statistics and PCA / whitening.

Standard embedding-pipeline preprocessing (SemDeDup, retrieval-index
builds, and every "whiten before cosine" recipe): estimate the mean
vector and covariance matrix of an ``array<float>`` column, take the
top-k eigenvectors, project (optionally whiten). For a d-dimensional
embedding the sufficient statistics are tiny — ``(n, Σx, Σxxᵀ)`` is
d²+d+1 numbers — so the 100 TB shape is: reduce the corpus to those
statistics in one pass (bounded driver fold, exactly like the k-means
centroid fold), eigendecompose the d×d matrix driver-side with numpy,
and broadcast the projection matrix back into a narrow map.

Reference repo has no vector surface (ETL/sync only,
``/root/reference/README.md:1-17``); [extension] per the driver
charter.

Two implementations of the moment pass:

- ``impl="exact"``: explode each vector into (i, x_i) pairs and join
  position-pairs per row via a double ``posexplode`` — every product
  is rounded and DECIMAL-accumulated, so the result is
  order-independent and the DuckDB oracle replays it bit-for-bit
  (the gate configuration).
- ``impl="arrow"``: per-Arrow-batch BLAS partials (``Xᵀ·X`` per
  batch via numpy matmul) — one matmul per ~10k rows instead of d²
  interpreted multiplies per row, the production path; sums
  accumulate in float64, so it is *numerically* (not bitwise) equal
  to exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(
    df: DataFrame, vec_col: str, impl: str = "arrow",
    round_digits: int = 10,
) -> DataFrame:
    """Upper-triangle second moments of the embedding column:
    ``(i, j, n, sum_i, sum_xy)`` for every dimension pair ``i ≤ j``
    (d(d+1)/2 rows), where ``sum_i = Σ x_i`` (the first moment,
    carried on every pair so the consumer can form covariance without
    a second relation: ``cov = sum_xy/n − (sum_i/n)(sum_j/n)`` needs
    ``sum_j``, joined back from the ``i = j`` rows) and
    ``sum_xy = Σ x_i·x_j``.

    Exactness (``impl="exact"``): each product is rounded to
    ``round_digits`` then accumulated as DECIMAL — order-independent,
    engine-portable (the q105/q112 discipline). The arrow impl
    accumulates float64 per batch partials and is for production
    throughput."""
    d = df.select(F.size(vec_col).alias("d")).head()
    if d is None:
        raise ValueError("embedding_moments on an empty relation")
    dim = d["d"]
    if impl == "exact":
        xi = df.select(F.posexplode(vec_col).alias("i", "x"))
        pairs = (df.select(F.posexplode(vec_col).alias("i", "x"),
                           F.col(vec_col).alias("_v"))
                 .select("i", "x", F.posexplode("_v").alias("j", "y"))
                 .where(F.col("j") >= F.col("i")))
        prod = F.round(F.col("x").cast("double")
                       * F.col("y").cast("double"), round_digits) \
            .cast(f"decimal(28,{round_digits})")
        sums = (pairs.groupBy("i", "j")
                .agg(F.count("*").cast("bigint").alias("n"),
                     F.sum(prod).cast(f"decimal(38,{round_digits})")
                     .alias("sum_xy")))
        firsts = (xi.groupBy("i")
                  .agg(F.sum(F.round(F.col("x").cast("double"),
                                     round_digits)
                             .cast(f"decimal(28,{round_digits})"))
                       .cast(f"decimal(38,{round_digits})")
                       .alias("sum_i")))
        return (sums.join(F.broadcast(firsts), "i")
                .select(F.col("i").cast("int").alias("i"),
                        F.col("j").cast("int").alias("j"),
                        "n", "sum_i", "sum_xy"))
    if impl == "arrow":
        def gram_partials(batches):
            # one (1 + d + d²)-slot partial per Arrow batch:
            # [n, Σx (d), ΣxxT (d², row-major)] — a single BLAS matmul
            # per ~10k rows. mapInPandas (not a scalar UDF with a
            # carrier row): partials are REAL rows yielded once, so no
            # re-evaluation-under-different-batching hazard.
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.asarray([np.asarray(v, dtype=np.float64)
                                for v in pdf[vec_col]])
                out = np.concatenate([[float(len(pdf))], x.sum(axis=0),
                                      (x.T @ x).ravel()])
                yield pd.DataFrame(
                    {"slot": np.arange(out.size, dtype="int64"),
                     "val": out})

        partials = df.select(vec_col).mapInPandas(
            gram_partials, "slot long, val double")
        # ≤ (1+d+d²) × n_batches rows — tiny; one bounded aggregate
        agg = partials.groupBy("slot").agg(F.sum("val").alias("s"))
        # reshape the flat slots back to (i, j) coordinates
        ij = agg.where(F.col("slot") >= 1 + dim).select(
            ((F.col("slot") - 1 - dim) / dim).cast("int").alias("i"),
            ((F.col("slot") - 1 - dim) % dim).cast("int").alias("j"),
            F.col("s").alias("sum_xy"))
        fi = agg.where((F.col("slot") >= 1)
                       & (F.col("slot") < 1 + dim)).select(
            (F.col("slot") - 1).cast("int").alias("i"),
            F.col("s").alias("sum_i"))
        n_df = agg.where(F.col("slot") == 0).select(
            F.col("s").cast("bigint").alias("n"))
        return (ij.where(F.col("j") >= F.col("i"))
                .join(F.broadcast(fi), "i")
                .crossJoin(F.broadcast(n_df))
                .select("i", "j", "n", "sum_i", "sum_xy"))
    raise ValueError(f"unknown impl {impl!r} — 'exact' or 'arrow'")


def pca_components(moments_rows, dim: int, k: int):
    """Driver-side eigendecomposition of the covariance assembled from
    collected :func:`embedding_moments` rows — a d×d bounded fold, the
    only driver materialization in the pipeline. Returns
    ``(mean[d], components[k, d], eigvals[k])`` (numpy, eigenvalues
    descending)."""
    import numpy as np

    cov = np.zeros((dim, dim))
    mean = np.zeros(dim)
    n = None
    sums = np.zeros(dim)
    raw = {}
    for r in moments_rows:
        n = int(r["n"])
        sums[int(r["i"])] = float(r["sum_i"])
        raw[(int(r["i"]), int(r["j"]))] = float(r["sum_xy"])
    if not n:
        raise ValueError("no moment rows")
    mean = sums / n
    for (i, j), sxy in raw.items():
        c = sxy / n - mean[i] * mean[j]
        cov[i, j] = c
        cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    return mean, vecs[:, order].T.copy(), vals[order]


def pca_project(
    df: DataFrame, vec_col: str, id_col: str, k: int,
    whiten: bool = False, impl: str = "arrow",
) -> DataFrame:
    """(id, pc[k]) — project embeddings onto the top-k principal
    components (optionally whitened: unit variance per component).
    One moment pass (``impl`` as :func:`embedding_moments`), one d×d
    driver eigh, then a broadcast matmul kernel per Arrow batch —
    narrow, no shuffle."""
    import numpy as np
    import pandas as pd

    from db2pq_spark.functions.arrow import series_pandas_udf

    head = df.select(F.size(vec_col).alias("d")).head()
    if head is None:
        raise ValueError("pca_project on an empty relation")
    d = head["d"]
    rows = embedding_moments(df, vec_col, impl=impl).collect()
    mean, comps, vals = pca_components(rows, d, k)
    if whiten:
        comps = comps / np.sqrt(np.maximum(vals, 1e-12))[:, None]
    mean_b, comps_b = mean, comps  # captured in the kernel closure

    def project(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        y = (x - mean_b) @ comps_b.T
        return pd.Series(list(y))

    proj = series_pandas_udf(project, "array<double>")
    return df.select(F.col(id_col).alias("id"),
                     proj(F.col(vec_col)).alias("pc"))
