"""Bloom-filter membership — broadcastable set summaries for pre-join
pruning.

[extension — not in the reference] The incremental pipelines
(:func:`..dedup.exact_dedup_incremental`, decontamination) broadcast a
distinct-key set to prune the big side before any shuffle; at corpus
scale that broadcast grows with the corpus. A Bloom filter caps it at
a fixed bitmap (default 2^22 bits = 512 KiB) with zero false
negatives: probe survivors are a superset of true matches, so a bloom
pre-filter composes with any exact check downstream — the standard
"shrink the build side" move before a broadcast join.

Engine-portable by construction: bit position j of a key is
``md5(salt‖j‖key)`` reduced mod ``n_bits`` — the same md5-bucket
scheme as :mod:`.sampling`, so DuckDB/Trino replay membership
bit-for-bit (the q111 oracle does exactly that).

Scale shape: the build is explode(k) → one (word → OR) aggregate →
a single map-assembled row whose size is the bitmap (bounded by
construction, never by the data); the probe is a broadcast of that one
row plus a narrow projection — neither side of a probe ever shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db2pq_spark.operators.sampling import hash_bucket, hash_bucket_sql

__all__ = ["bloom_build", "bloom_probe", "bloom_fpr", "bloom_member_sql"]

#: default bitmap: 2^22 bits = 512 KiB = 65 536 longs
DEFAULT_N_BITS = 1 << 22
DEFAULT_K = 4


def _positions(key: Column | str, n_bits: int, k: int,
               salt: str) -> list[Column]:
    """The k md5-derived bit positions of a key (see module docstring)."""
    return [hash_bucket(key, n_bits, salt=f"{salt}|{j}") for j in range(k)]


def bloom_build(
    df: DataFrame, key: str, n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K, salt: str = "",
) -> DataFrame:
    """One-row relation ``(n_bits, k, salt, bitmap array<long>)``
    summarizing the distinct keys of ``df``.

    ``n_bits`` must be a multiple of 64. Plan: k positions per key
    (narrow) → map-side-combined OR aggregate per 64-bit word (≤
    n_bits/64 rows shuffle) → one map-assembly row. The final
    single-row stage materializes only the bitmap — bounded by
    ``n_bits``, independent of the input size, which is the entire
    point of the structure."""
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(f"n_bits must be a positive multiple of 64, "
                         f"got {n_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_words = n_bits // 64
    pos = F.explode(F.array(*_positions(key, n_bits, k, salt))) \
           .alias("pos")
    # F.shiftleft takes only a literal count — the per-row shift runs
    # as a SQL expression instead
    ent = (df.where(F.col(key).isNotNull())
             .select(pos)
             .select((F.col("pos") / 64).cast("int").alias("word"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(pos % 64 AS INT))").alias("mask")))
    words = ent.groupBy("word").agg(
        F.bit_or("mask").alias("w"))
    return (
        words.agg(F.map_from_entries(
            F.collect_list(F.struct("word", "w"))).alias("_m"))
        .select(
            F.lit(n_bits).alias("n_bits"),
            F.lit(k).alias("k"),
            F.lit(salt).alias("salt"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(F.col("_m")[i],
                                     F.lit(0).cast("long")),
            ).alias("bitmap"))
    )


def bloom_probe(
    df: DataFrame, key: str, bloom: DataFrame,
    out_col: str = "might_contain",
) -> DataFrame:
    """Add ``out_col``: False ⇒ the key is definitely NOT in the built
    set (no false negatives); True ⇒ probably in it (FPR per
    :func:`bloom_fpr`). The one-row ``bloom`` relation broadcasts; the
    probe side never shuffles. Parameters (n_bits, k, salt) ride in
    the bloom row itself, so a persisted filter can't silently be
    probed with mismatched hashing."""
    rows = bloom.head(2)
    if not rows:
        raise ValueError("bloom relation is empty")
    if len(rows) > 1:
        # >1 row would CROSS-JOIN and silently multiply every probe row
        # (e.g. an accidental union of two builds, or a raw relation
        # passed by mistake)
        raise ValueError(
            "bloom relation must be exactly one bloom_build() row, "
            "got >= 2 rows — refusing to cross-join a multi-row "
            "relation into the probe side")
    n_bits, k, salt = rows[0]["n_bits"], rows[0]["k"], rows[0]["salt"]
    clash = [c for c in df.columns
             if c == "bitmap" or c.startswith("__bp")]
    if clash:
        raise ValueError(
            f"probe DataFrame already has column(s) {clash} which "
            "bloom_probe uses internally — rename them before probing")
    if out_col == "bitmap" or out_col.startswith("__bp"):
        # the final .drop() would silently delete the result column
        raise ValueError(
            f"out_col {out_col!r} collides with bloom_probe's internal "
            "columns — pick another name")
    probed = df.join(F.broadcast(
        bloom.select("bitmap")), how="cross")
    cond = F.lit(True)
    for j, p in enumerate(_positions(key, n_bits, k, salt)):
        # per-row shift count needs the SQL form (F.shiftleft takes
        # only a literal count), hence the named position column
        probed = probed.withColumn(f"__bp{j}", p)
        bit = F.expr(
            f"element_at(bitmap, CAST(__bp{j} / 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(__bp{j} % 64 AS INT))")
        cond = cond & (bit != 0)
    return (probed.withColumn(out_col, cond)
            .drop("bitmap", *[f"__bp{j}" for j in range(k)]))


def bloom_fpr(n_keys: int, n_bits: int = DEFAULT_N_BITS,
              k: int = DEFAULT_K) -> float:
    """Expected false-positive rate ``(1 - e^(-k·n/m))^k``."""
    return (1.0 - math.exp(-k * n_keys / float(n_bits))) ** k


def bloom_member_sql(
    probe_key_expr: str, build_keys_sql: str,
    n_bits: int = DEFAULT_N_BITS, k: int = DEFAULT_K, salt: str = "",
) -> str:
    """ANSI twin of a bloom probe for the oracles: TRUE iff every one
    of the probe key's k positions is set by some build key (any hash
    index) — semantically identical to probing the bitmap.
    ``build_keys_sql`` must select a single column named ``key``."""
    build_pos = " UNION ".join(
        f"SELECT {hash_bucket_sql('key', n_bits, salt=f'{salt}|{j}')} "
        f"AS pos FROM __bloom_keys"
        for j in range(k))
    probe_checks = " AND ".join(
        f"{hash_bucket_sql(probe_key_expr, n_bits, salt=f'{salt}|{j}')} "
        f"IN (SELECT pos FROM __bloom_bits)"
        for j in range(k))
    return (f"(WITH __bloom_keys AS ({build_keys_sql}), "
            f"__bloom_bits AS ({build_pos}) "
            f"SELECT {probe_checks})")
