"""Product-quantization ANN (IVF-PQ building blocks).

[extension — not in the reference] Product quantization (Jégou,
Douze, Schmid 2011, *Product Quantization for Nearest Neighbor
Search*, IEEE TPAMI 33(1)) — the capability step past the scalar
quantizer (q110/q115) and the coarse-only IVF (q46): split each
``dim``-vector into ``m`` subspaces of ``d = dim/m`` components, train
a ``k``-centroid codebook per subspace (the already-gated
deterministic Lloyd trainer, ``clustering.kmeans_fit``), encode every
vector as ``m`` byte-ish codes, and answer queries with ADC
(asymmetric distance computation): per query, ONE ``m × k`` lookup
table of exact partial distances to every codebook centroid, then
each encoded vector's distance is ``m`` table lookups — no float math
per candidate, no decode.

Scale shape:

- **train**: ``m`` sequential ``kmeans_fit`` runs on in-row slices —
  each is the q117-verified plan (narrow explode + broadcast
  centroid join + bounded k×d driver fold per round);
- **encode**: one posexplode of the corpus joined to the broadcast
  ``m·k·d``-row codebook relation, exact-decimal argmin per
  (id, subspace), one per-id fold to the code array — n×k×dim narrow
  rows, the kmeans_assign shape; ``impl="arrow"`` runs the same
  argmin as one NumPy distance tensor per Arrow batch (production;
  not bit-replayable on boundary ties, same contract as
  kmeans_fit's arrow mode);
- **ADC top-k**: the query side is tiny (queries × m × k lookup
  table, broadcast); candidates pay one code explode + one broadcast
  join + one (query, id) decimal aggregate — never a per-candidate
  float vector op;
- **IVF-PQ**: the composition with the coarse quantizer — candidates
  restricted to the query's ``n_probe`` nearest cells first, ADC
  re-ranks only that minority. (Codes quantize RAW vectors, not
  cell residuals — the IVFADC paper variant encodes residuals for
  tighter cells; documented simplification, recall measured as-is.)

Determinism (gate config ``impl="exact"``): every distance is an
exact-decimal sum of squared double differences, argmins tie to the
lower code/cluster, and the q151 oracle replays training
CTE-per-round (the q117 pattern, once per subspace), encoding and the
ADC table closed-form — codes and distances are hash-verified, not
just plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from db2pq_spark.operators.clustering import _DEC, kmeans_fit

__all__ = ["pq_train", "pq_encode", "pq_adc_topk", "ivf_pq_topk",
           "pq_books_df", "pq_books_restore",
           "pq_subspace_sql", "pq_encode_sql", "pq_adc_sql"]


def pq_train(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    m: int = 4, k: int = 8, iterations: int = 2,
    dim: int | None = None, impl: str = "exact",
) -> list[list[list[float]]]:
    """Train the ``m`` per-subspace codebooks: returns
    ``codebooks[sub][code] = centroid`` (``dim/m`` floats each) — the
    PQ model, ``m·k·d`` floats total (driver-bounded, broadcastable
    by construction). Each subspace trains the deterministic
    :func:`~db2pq_spark.operators.clustering.kmeans_fit` on the
    in-row vector slice (lowest-id seeding, exact-decimal distances,
    9-digit rounded means — the q117 contract)."""
    if impl not in ("exact", "arrow"):
        raise ValueError(f"unknown pq train impl {impl!r}")
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    # lowest-id seeding, per subspace = the same k rows sliced — the
    # exact kmeans_fit init each subspace would compute alone. The
    # seed rows also carry the vector width, so the former separate
    # _dim_of first() job is gone when ``dim`` isn't given (r13).
    init = base.orderBy("id").limit(int(k)).collect()
    if not init:
        raise ValueError("no vectors to train on")
    dim = len(init[0]["vec"]) if dim is None else int(dim)
    if dim % int(m) != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d = dim // int(m)
    books = [[[float(x) for x in r["vec"][s * d:(s + 1) * d]]
              for r in init] for s in range(int(m))]
    # all m subspaces train JOINTLY: the per-subspace Lloyd rounds are
    # independent, so one assignment pass (the pq_encode argmin — the
    # identical per-(id, sub) decimal math kmeans_fit would run on
    # each slice) and one (sub, code, subdim) mean aggregate update
    # every codebook per round — iterations total rounds instead of
    # m × iterations sequential ones, bit-identical centroids (the
    # q151 oracle replays the per-subspace chains and agrees)
    for _ in range(int(iterations)):
        if impl == "arrow":
            # r13: the per-row codes come from the SAME argmin kernel
            # pq_encode runs, attached in-row — the former
            # (id, sub)-keyed join of the code relation against the
            # n·dim component relation (a full shuffle of both, every
            # round) is gone; the only exchange left is the map-side-
            # combined m·k·d aggregate. The codes array is the
            # GENERATOR argument (evaluated once per corpus row — a
            # projection beside posexplode would re-evaluate the
            # Python kernel once per exploded row), and the subspace
            # components are re-sliced in-row below it.
            enc = _arrow_codes_col(books, d)
            terms = (base
                     .select("vec",
                             F.posexplode(enc(F.col("vec")))
                             .alias("sub", "code"))
                     .select("sub", "code",
                             F.posexplode(F.expr(
                                 f"slice(vec, sub * {d} + 1, {d})"))
                             .alias("subdim", "_x"))
                     .select("sub", "code", "subdim",
                             F.col("_x").cast("double").alias("_x")))
        else:
            assigned = pq_encode(base, books, "vec", "id", impl=impl) \
                .select("id", F.posexplode("codes").alias("sub", "code"))
            vals = (base.select("id",
                                F.posexplode("vec").alias("pos", "_x"))
                    .select("id",
                            (F.col("pos") / d).cast("int").alias("sub"),
                            (F.col("pos") % d).alias("subdim"),
                            F.col("_x").cast("double").alias("_x")))
            terms = assigned.join(vals, ["id", "sub"])
        means = (terms
                 .groupBy("sub", "code", "subdim")
                 .agg(F.sum(F.col("_x").cast(_DEC)).alias("_s"),
                      F.count("*").alias("_c"))
                 .select("sub", "code", "subdim",
                         F.round(F.col("_s").cast("double")
                                 / F.col("_c"), 9).alias("_m"))
                 .collect())  # bounded: m × k × d rows
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r["sub"], r["code"]), {})[r["subdim"]] = \
                float(r["_m"])
        books = [[([got[(s, c)][i] for i in range(d)]
                   if (s, c) in got else books[s][c])
                  for c in range(int(k))] for s in range(int(m))]
    return books


def _arrow_codes_col(codebooks, d: int):
    """The arrow encode kernel as a reusable column function: one
    NumPy distance tensor per Arrow batch, all ``m`` argmins per
    vector (ties to the lower code via argmin's first-minimum)."""
    import numpy as np
    import pandas as pd

    from db2pq_spark.functions.arrow import series_pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k, d)
    mm = cb.shape[0]

    def kern(vecs):
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64).reshape(mm, 1, d)
            d2 = ((x - cb) ** 2).sum(axis=2)        # (m, k)
            out.append(d2.argmin(axis=1).astype("int32"))
        return pd.Series(out)

    return series_pandas_udf(kern, "array<int>")


def _assign_encode_arrow(df: DataFrame, centroids: list[list[float]],
                         codebooks, vec_col: str,
                         id_col: str) -> DataFrame:
    """(id, cluster, codes) in ONE Arrow pass: the coarse argmin and
    all ``m`` PQ-code argmins per vector, fused. Cluster labels use
    the identical float expression as
    :func:`~db2pq_spark.operators.clustering.kmeans_assign_arrow`
    (``-2·V·Cᵀ + ‖c‖²`` argmin, first-minimum ties) and codes the
    identical tensor as :func:`_arrow_codes_col`, so the fused kernel
    returns exactly what the former assignment scan + encode scan +
    (id ⋈ id) join produced — minus one corpus scan and the
    corpus-sized join."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StructField, StructType)

    C = np.asarray(centroids, dtype=np.float64)          # (kc, dim)
    c2 = (C * C).sum(axis=1)
    cb = np.asarray(codebooks, dtype=np.float64)         # (m, k, d)
    mm, _, dd = cb.shape
    id_t = df.select(F.col(id_col).alias("id")).schema.fields[0]
    out_schema = StructType([
        id_t, StructField("cluster", LongType()),
        StructField("codes", ArrayType(IntegerType()))])

    def kern(batches):
        for pdf in batches:
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]]) if len(pdf) else \
                np.zeros((0, C.shape[1]))
            dc = -2.0 * (V @ C.T) + c2
            codes = [((v.reshape(mm, 1, dd) - cb) ** 2).sum(axis=2)
                     .argmin(axis=1).astype("int32") for v in V]
            yield type(pdf)({"id": pdf[id_col],
                             "cluster": dc.argmin(axis=1),
                             "codes": codes})

    base = df.where(F.col(vec_col).isNotNull()).select(id_col, vec_col)
    return (base.mapInPandas(kern, schema=out_schema)
            .select("id", F.col("cluster").cast("int").alias("cluster"),
                    "codes"))


def _codebook_df(spark, codebooks) -> DataFrame:
    rows = [(s, c, sd, float(x))
            for s, book in enumerate(codebooks)
            for c, ctr in enumerate(book)
            for sd, x in enumerate(ctr)]
    return spark.createDataFrame(
        rows, "sub int, code int, subdim int, c double")


def pq_encode(
    df: DataFrame, codebooks: list[list[list[float]]],
    vec_col: str = "embedding", id_col: str = "vec_id",
    impl: str = "exact",
) -> DataFrame:
    """(id, codes): each vector's ``m`` nearest-centroid codes, in
    subspace order. ``impl="exact"`` is the engine-replayable
    exact-decimal argmin; ``impl="arrow"`` computes all ``m`` argmins
    in one NumPy distance tensor per Arrow batch (production)."""
    if impl not in ("exact", "arrow"):
        raise ValueError(f"unknown pq encode impl {impl!r}")
    d = len(codebooks[0][0])
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if impl == "arrow":
        enc = _arrow_codes_col(codebooks, d)
        return base.select("id", enc(F.col("vec")).alias("codes"))
    cdf = _codebook_df(df.sparkSession, codebooks)
    terms = (base.select("id", F.posexplode("vec").alias("pos", "_x"))
             .select("id", (F.col("pos") / d).cast("int").alias("sub"),
                     (F.col("pos") % d).alias("subdim"),
                     F.col("_x").cast("double").alias("_x"))
             .join(F.broadcast(cdf), ["sub", "subdim"])
             .select("id", "sub", "code",
                     ((F.col("_x") - F.col("c"))
                      * (F.col("_x") - F.col("c"))).cast(_DEC)
                     .alias("_t")))
    d2 = terms.groupBy("id", "sub", "code").agg(F.sum("_t").alias("_d2"))
    best = (d2.groupBy("id", "sub")
            .agg(F.min(F.struct("_d2", "code")).alias("_m"))
            .select("id", "sub", F.col("_m.code").alias("code")))
    return (best.groupBy("id")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"]).alias("codes")))


def _query_lut(q: DataFrame, codebooks, d: int) -> DataFrame:
    """(query_id, _lut) — the per-query ADC lookup table flattened to
    ONE decimal array ordered by (sub, code): ``_lut[sub·k + code]``
    is the exact-decimal partial distance of the query's ``sub``-slice
    to centroid ``code``. Same per-(sub, code) decimal sums as the old
    (query_id, sub, code, partial) relation, folded in-row so the
    candidate side can score by ``m`` array lookups with no join key
    wider than ``query_id``."""
    cdf = _codebook_df(q.sparkSession, codebooks)
    return (q.select("query_id", F.posexplode("qvec").alias("pos", "_x"))
            .select("query_id",
                    (F.col("pos") / d).cast("int").alias("sub"),
                    (F.col("pos") % d).alias("subdim"),
                    F.col("_x").cast("double").alias("_x"))
            .join(F.broadcast(cdf), ["sub", "subdim"])
            .groupBy("query_id", "sub", "code")
            .agg(F.sum(((F.col("_x") - F.col("c"))
                        * (F.col("_x") - F.col("c"))).cast(_DEC))
                 .alias("partial"))
            .groupBy("query_id")
            .agg(F.transform(
                F.sort_array(F.collect_list(
                    F.struct("sub", "code", "partial"))),
                lambda s: s["partial"].cast("decimal(27,10)"))
                .alias("_lut")))


def _adc_d2(codes: "F.Column", lut: "F.Column", m: int,
            k: int) -> "F.Column":
    """Exact-decimal ADC distance: ``Σ_sub lut[sub·k + codes[sub]]``.
    Decimal addition is exact, so the in-row fold equals the former
    ``SUM(partial)`` aggregate bit-for-bit (order-independent).

    Typing: lut entries and the accumulator are both pinned to
    decimal(27,10) so each ``acc + elem`` lands exactly at
    decimal(28,10) with NO precision-loss scale adjustment (a
    (38,10)+(38,10) add would round to scale 9 — silently off the old
    aggregate); the value-preserving cast back to (27,10) per step
    only overflows past ~1e17, far beyond any squared-distance sum,
    and raises under ANSI rather than corrupting the ranking."""
    acc_t = "decimal(27,10)"
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(int(m) - 1)),
        F.lit(0).cast(acc_t),
        lambda acc, s: (acc + F.element_at(
            lut, s * int(k) + F.element_at(codes, s + 1) + 1)
        ).cast(acc_t))


def pq_adc_topk(
    encoded: DataFrame, queries: DataFrame,
    codebooks: list[list[list[float]]], k_top: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: ``(query_id, vec_id, adc_d2, rank)`` — the ``k_top``
    encoded vectors with the smallest table-lookup distance per query
    (ties to the lower id; self-matches excluded). ``encoded`` is a
    :func:`pq_encode` relation; queries stay raw vectors (asymmetric:
    only the CORPUS is quantized).

    Plan shape (r13): the per-query lookup table folds to ONE
    broadcast (query_id, _lut) row; each encoded row scores every
    query with ``m`` in-row array lookups summed in exact decimal —
    the former code-explode + (sub, code) join + (query, vec)
    re-aggregate (a corpus×m-row exchange) is gone, leaving the
    query-keyed top-k rank as the only corpus-sized shuffle."""
    d = len(codebooks[0][0])
    m, k = len(codebooks), len(codebooks[0])
    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    lut = _query_lut(q, codebooks, d)
    cand = (encoded.select(F.col("id").alias("vec_id"), "codes")
            .join(F.broadcast(lut),
                  F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id",
                    _adc_d2(F.col("codes"), F.col("_lut"), m, k)
                    .alias("_d2")))
    w = W.partitionBy("query_id").orderBy(F.asc("_d2"), F.asc("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k_top))
            .select("query_id", "vec_id",
                    F.col("_d2").cast("double").alias("adc_d2"),
                    F.col("rank").cast("bigint").alias("rank")))


def ivf_pq_topk(
    corpus: DataFrame, queries: DataFrame, k_top: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    m: int = 4, k_codes: int = 8, n_clusters: int = 16,
    n_probe: int = 4, iterations: int = 2, impl: str = "arrow",
) -> DataFrame:
    """The standard IVF-PQ index as one composition: the
    deterministic coarse quantizer (:func:`kmeans_fit`) buckets the
    corpus into inverted lists, each query probes its ``n_probe``
    nearest cells, and ADC over PQ codes re-ranks ONLY that minority
    — the q46 IVF shape with the per-candidate exact re-rank replaced
    by table lookups. Returns ``(query_id, vec_id, adc_d2, rank)``.

    r13 plan shape: the two trainers are INDEPENDENT driver loops
    (each a short chain of bounded collects), so they run on two
    driver threads and their per-iteration barriers interleave
    (guide-§2.6 overlap — the scheduler backfills one loop's stragglers
    with the other's tasks). Under ``impl="arrow"`` the final coarse
    assignment and the PQ encoding then fuse into ONE Arrow kernel
    pass emitting (id, cluster, codes) — the former separate
    assignment scan, encode scan and corpus-sized (id ⋈ id) join are
    gone; ADC over the probed cells scores with the in-row decimal
    lookup fold (see :func:`pq_adc_topk`), leaving the query-keyed
    rank as the only corpus-sized shuffle."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_km = pool.submit(kmeans_fit, corpus, vec_col, id_col,
                             k=int(n_clusters),
                             iterations=int(iterations), impl=impl)
        fut_pq = pool.submit(pq_train, corpus, vec_col, id_col,
                             m=m, k=k_codes, iterations=iterations,
                             impl=impl)
        assigned, centroids = fut_km.result()
        books = fut_pq.result()
    if impl == "arrow":
        enc = _assign_encode_arrow(corpus, centroids, books,
                                   vec_col, id_col)
    else:
        codes = pq_encode(corpus, books, vec_col, id_col, impl=impl)
        enc = assigned.select(F.col("id"), "cluster") \
            .join(codes, "id")
    cdf = corpus.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>")
    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qc = q.crossJoin(F.broadcast(cdf)).select(
        "query_id", "cluster",
        F.aggregate(
            F.zip_with("qvec", "centroid",
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, x: acc + x).alias("dist2"))
    wq = W.partitionBy("query_id").orderBy(F.asc("dist2"),
                                           F.asc("cluster"))
    probes = (qc.withColumn("p", F.row_number().over(wq))
              .where(F.col("p") <= int(n_probe))
              .select("query_id", "cluster"))
    cells = enc.join(F.broadcast(probes), "cluster") \
        .select("id", "codes", "query_id")
    # ADC restricted to probed cells: the same flattened broadcast
    # lookup table + in-row decimal fold as pq_adc_topk — no code
    # explode, no (query, sub, code) join, no (query, vec) re-aggregate
    d = len(books[0][0])
    lut = _query_lut(q.select("query_id", "qvec"), books, d)
    cand = (cells.where(F.col("id") != F.col("query_id"))
            .join(F.broadcast(lut), "query_id")
            .select("query_id", F.col("id").alias("vec_id"),
                    _adc_d2(F.col("codes"), F.col("_lut"),
                            int(m), int(k_codes)).alias("_d2")))
    w = W.partitionBy("query_id").orderBy(F.asc("_d2"), F.asc("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k_top))
            .select("query_id", "vec_id",
                    F.col("_d2").cast("double").alias("adc_d2"),
                    F.col("rank").cast("bigint").alias("rank")))


# ---------------------------------------------------------------- SQL
# DuckDB oracle generators — replay per-subspace training
# CTE-per-round (the q117 pattern on vector slices), encoding and the
# ADC table closed-form.

def pq_subspace_sql(tag: str, base: str, lo: int, d: int, k: int,
                    iterations: int, round_scale: int = 9) -> str:
    """CTE chain ending in ``{tag}_cb(code, subdim, c)``: train one
    subspace codebook on ``{base}(id, vec)`` slice components
    ``vec[lo+1 .. lo+d]`` — lowest-id seeding, exact-decimal
    distances, ROUND(…, {round_scale}) means, empty clusters keep the
    previous centroid (the q117 replay, parameterized)."""
    ctes = [f"""
    {tag}_c0 AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS code,
             vec[{lo + 1}:{lo + d}] AS centroid
      FROM (SELECT id, vec FROM {base} ORDER BY id LIMIT {k})
    )"""]
    for r in range(1, iterations + 1):
        prev = f"{tag}_c{r - 1}"
        ctes.append(f"""
    {tag}_d{r} AS MATERIALIZED (
      SELECT b.id, c.code,
             SUM(CAST((b.vec[{lo} + i] - c.centroid[i])
                      * (b.vec[{lo} + i] - c.centroid[i])
                      AS DECIMAL(28,10))) AS d2
      FROM {base} b, {prev} c,
           unnest(generate_series(1, {d})) AS t(i)
      GROUP BY b.id, c.code
    ),
    {tag}_a{r} AS MATERIALIZED (
      SELECT id, code FROM (
        SELECT id, code,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY d2, code) AS rn
        FROM {tag}_d{r}) WHERE rn = 1
    ),
    {tag}_m{r} AS MATERIALIZED (
      SELECT a.code, i AS subdim,
             ROUND(CAST(SUM(CAST(b.vec[{lo} + i] AS DECIMAL(28,10)))
                        AS DOUBLE) / COUNT(*), {round_scale}) AS m
      FROM {tag}_a{r} a JOIN {base} b USING (id),
           unnest(generate_series(1, {d})) AS t(i)
      GROUP BY a.code, i
    ),
    {tag}_c{r} AS MATERIALIZED (
      SELECT p.code, COALESCE(n.centroid, p.centroid) AS centroid
      FROM {prev} p LEFT JOIN (
        SELECT code, array_agg(m ORDER BY subdim) AS centroid
        FROM {tag}_m{r} GROUP BY code) n USING (code)
    )""")
    ctes.append(f"""
    {tag}_cb AS MATERIALIZED (
      SELECT code, i - 1 AS subdim, centroid[i] AS c
      FROM {tag}_c{iterations},
           unnest(generate_series(1, {d})) AS t(i)
    )""")
    return ",".join(ctes)


def pq_encode_sql(tag: str, base: str, sub_tags: list[str],
                  d: int) -> str:
    """CTE ``{tag}_codes(id, sub, code)``: exact-decimal argmin of
    each vector slice against each subspace's ``{sub_tag}_cb``."""
    parts = []
    for s, st in enumerate(sub_tags):
        lo = s * d
        parts.append(f"""
        SELECT id, {s} AS sub, code FROM (
          SELECT b.id, cb.code,
                 ROW_NUMBER() OVER (
                   PARTITION BY b.id
                   ORDER BY SUM(CAST(
                     (b.vec[{lo} + cb.subdim + 1] - cb.c)
                     * (b.vec[{lo} + cb.subdim + 1] - cb.c)
                     AS DECIMAL(28,10))), cb.code
                 ) AS rn
          FROM {base} b, {st}_cb cb
          GROUP BY b.id, cb.code
        ) WHERE rn = 1""")
    body = "\n        UNION ALL ".join(parts)
    return f"""
    {tag}_codes AS MATERIALIZED (
        {body}
    )"""


def pq_adc_sql(tag: str, base: str, codes: str, queries: str,
               sub_tags: list[str], d: int, k_top: int) -> str:
    """CTEs ``{tag}_lut, {tag}_topk``: the per-query ADC lookup table
    and the (adc_d2, vec_id)-ranked top-``k_top`` per query."""
    luts = []
    for s, st in enumerate(sub_tags):
        lo = s * d
        luts.append(f"""
        SELECT q.id AS query_id, {s} AS sub, cb.code,
               SUM(CAST((q.vec[{lo} + cb.subdim + 1] - cb.c)
                        * (q.vec[{lo} + cb.subdim + 1] - cb.c)
                        AS DECIMAL(28,10))) AS partial
        FROM {queries} q, {st}_cb cb
        GROUP BY q.id, cb.code""")
    lut_body = "\n        UNION ALL ".join(luts)
    return f"""
    {tag}_lut AS MATERIALIZED (
        {lut_body}
    ),
    {tag}_topk AS MATERIALIZED (
      SELECT query_id, vec_id, CAST(d2 AS DOUBLE) AS adc_d2,
             CAST(rn AS BIGINT) AS rank
      FROM (
        SELECT s.query_id, s.vec_id, s.d2,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                                  ORDER BY s.d2, s.vec_id) AS rn
        FROM (
          SELECT l.query_id, c.id AS vec_id, SUM(l.partial) AS d2
          FROM {codes} c JOIN {tag}_lut l
            ON l.sub = c.sub AND l.code = c.code
          WHERE c.id <> l.query_id
          GROUP BY l.query_id, c.id
        ) s
      ) WHERE rn <= {k_top}
    )"""


def pq_books_df(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """The trained codebooks as a persistable stamped relation —
    ``(sub, code, subdim, c, _pq_m, _pq_k, _pq_d)``; write it as
    parquet once and the index survives across batch arrivals (the
    train-once discipline of the persisted MinHash signatures, KN
    stats, and logreg weights). Stamps carry the geometry so a
    restore under different expectations refuses instead of silently
    mis-slicing."""
    m = len(codebooks)
    k = len(codebooks[0]) if m else 0
    d = len(codebooks[0][0]) if k else 0
    rows = [(s, c, sd, float(x), m, k, d)
            for s, book in enumerate(codebooks)
            for c, ctr in enumerate(book)
            for sd, x in enumerate(ctr)]
    return spark.createDataFrame(
        rows, "sub int, code int, subdim int, c double,"
              " _pq_m int, _pq_k int, _pq_d int")


def pq_books_restore(books_df: DataFrame, m: int, k: int,
                     d: int) -> list[list[list[float]]]:
    """Rebuild the driver-side codebook matrix from a persisted
    :func:`pq_books_df` relation, refusing geometry mismatches. The
    collect is bounded by construction (m·k·d rows — the same class
    as the trainer's own per-round fold); stamps are validated
    null-safely on every row during the fold."""
    rows = books_df.collect()
    if not rows:
        raise ValueError("pq_books_restore: empty codebook relation")
    books = [[[None] * int(d) for _ in range(int(k))]
             for _ in range(int(m))]
    for r in rows:
        if (r["_pq_m"], r["_pq_k"], r["_pq_d"]) != (m, k, d):
            raise ValueError(
                f"pq_books_restore: codebooks stamped "
                f"m={r['_pq_m']} k={r['_pq_k']} d={r['_pq_d']}, "
                f"caller expects m={m} k={k} d={d}")
        books[r["sub"]][r["code"]][r["subdim"]] = float(r["c"])
    for s in range(int(m)):
        for c in range(int(k)):
            if any(x is None for x in books[s][c]):
                raise ValueError(
                    f"pq_books_restore: centroid (sub={s}, code={c}) "
                    "has missing components")
    return books
