#!/usr/bin/env python
"""Scale smoke: replicate sf0.1 N× (default 10×, ~6 M-row lineitem) and
check that headline queries scale ~linearly — the local evidence that
the plans hold when data outgrows the fixtures. Writes SCALE_SMOKE.md
(10×) or SCALE_SMOKE_{N}x.md.

Replication shifts the join keys per copy so key cardinality grows with
the data (a pure union of identical copies would degenerate the joins:
N× duplicate keys instead of N× data). CONTENT columns are perturbed
per copy too:

- ``documents.text``: every token gets a per-copy suffix, so replicas
  are NOT near-duplicates of each other. Without this, every document
  has N−1 exact clones and the dedup family's OUTPUT grows
  quadratically in N — an artifact of content-identical replication,
  not an operator property; with it, duplicate structure (and therefore
  output) grows linearly, which is the realistic "corpus grows with new
  content" regime.
- ``embeddings.embedding``: a per-copy deterministic Rademacher sign
  pattern (component-wise ±1) — norm-preserving, decorrelates replicas
  (expected cosine ≈ 0), so ANN/semantic-dedup candidates scale with
  corpus size instead of every vector having N−1 parallel clones.

Dedup/ANN entries run the PRODUCTION operator configurations (16×4
capped MinHash banding, default SimHash chunking, 8×4 multi-probe LSH)
— the registry's gate entries pin exactness configs for their oracles,
which do strictly more work; scale behavior of the deployed defaults is
what this smoke certifies (same override pattern as bench.py).

Usage: python scripts/scale_smoke.py            (~6 min on local[32])
       SMOKE_COPIES=100 python scripts/scale_smoke.py   (~60 M rows)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("SMOKE_COPIES", "10"))
#: fewer steady repetitions at big factors — individual runs are long
#: enough to be stable there
RUNS = 3 if COPIES <= 10 else 2

#: key columns to shift per table so each replica has distinct keys
KEY_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    # events: new ids AND a 31-day time shift per copy so windowed /
    # range-join work grows linearly (overlapping copies would instead
    # deepen every window 10×, a different regime)
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

QUERIES = ["q01_pricing_summary", "q03_top_orders", "q05_region_revenue",
           "q06_forecast_revenue", "q08_running_total",
           "q64_waiting_supplier", "q66_hash_split",
           "q94_range_join", "q95_validation", "q96_bm25",
           "q97_weighted_sample", "q98_sliding_window",
           "q102_duplicate_spans", "q103_vocab_encode",
           "q107_incremental_dedup",
           # dedup / ANN family at production configs (overrides below)
           "q36_minhash_dedup", "q37_simhash_dedup",
           "q38_lsh_similarity", "q114_semantic_dedup",
           # round-6 operators (q117 via its production arrow override)
           "q115_quantized_topk", "q116_span_removal", "q117_kmeans",
           "q118_split_leakage",
           # round-7/8 operators (q119 via its production override)
           "q119_winnow_overlap", "q120_bpe_merges", "q121_kneser_ney",
           "q122_bpe_segment", "q123_winnow_incremental",
           # round-9 operators (q125/q126 via production overrides)
           "q124_nb_quality", "q125_dsir_sample",
           "q126_embedding_moments", "q127_cluster_representatives",
           "q128_mmr_select", "q129_nb_score_increment"]

#: 31 days in nanoseconds (when events.ts is epoch-nanos int64)
_MONTH_NS = 31 * 24 * 3600 * 1_000_000_000


def _overrides():
    """Production-config shapes for the approximate operators — the
    registry gate entries run exactness configs (exhaustive probes,
    uncapped 32×2 banding) whose extra work is an oracle surcharge,
    not deployed behavior. Mirrors bench.py's override pattern."""
    from pyspark.sql import functions as F

    from db2pq_spark.operators.dedup import minhash_dedup, simhash_dedup
    from db2pq_spark.operators.similarity import lsh_bucket_topk

    def q36(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_dedup(docs, "text", "doc_id")  # 16×4, cap 1000

    def q37(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return simhash_dedup(docs, "text", "doc_id")  # xxhash64, 4 chunks

    def q38(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return lsh_bucket_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)

    def q117(spark, sf_dir):
        from db2pq_spark.operators.clustering import kmeans_fit

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        assigned, _ = kmeans_fit(emb, "embedding", "vec_id",
                                 k=4, iterations=2, impl="arrow")
        return assigned.groupBy("cluster").count()

    def q102(spark, sf_dir):
        from db2pq_spark.operators.dedup import duplicate_spans

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return duplicate_spans(docs, "text", "doc_id", n=3)  # xxhash64

    def q116(spark, sf_dir):
        from db2pq_spark.operators.dedup import remove_duplicate_spans

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return remove_duplicate_spans(docs, "text", "doc_id",
                                      n=3, min_count=2)  # xxhash64

    def q119(spark, sf_dir):
        from db2pq_spark.operators.dedup import winnow_overlap_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return winnow_overlap_pairs(docs, "text", "doc_id",
                                    min_shared=2)  # k=5/w=4/cap 1000

    def q118(spark, sf_dir):
        from db2pq_spark.operators.dedup import minhash_dedup
        from db2pq_spark.operators.sampling import split_assign

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = minhash_dedup(docs, "text", "doc_id")  # 16x4, cap 1000
        sp = split_assign(docs, "doc_id",
                          {"train": 0.8, "test": 0.2}) \
            .select("doc_id", "split")
        return (pairs
                .join(sp.withColumnsRenamed(
                    {"doc_id": "id1", "split": "split1"}), "id1")
                .join(sp.withColumnsRenamed(
                    {"doc_id": "id2", "split": "split2"}), "id2")
                .where(F.col("split1") != F.col("split2")))

    def q107(spark, sf_dir):
        from db2pq_spark.operators.dedup import minhash_dedup_incremental

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_dedup_incremental(
            docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0),
            "text", "doc_id")  # production 16x4/cap-1000/hash shingles

    def q123(spark, sf_dir):
        from db2pq_spark.operators.dedup import winnow_overlap_incremental

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return winnow_overlap_incremental(
            docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0),
            "text", "doc_id", min_shared=2)  # arrow64 k=5/w=4/cap

    def q121(spark, sf_dir):
        from db2pq_spark.operators.textstats import kneser_ney_bigrams

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return kneser_ney_bigrams(docs, "text", "doc_id", keys="hash",
                                  broadcast_stats=True)

    def q125(spark, sf_dir):
        from db2pq_spark.operators.importance import dsir_sample

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return dsir_sample(docs, "text", "doc_id",
                           F.col("source") == "src1", k=200,
                           keys="xxhash64")

    def q126(spark, sf_dir):
        from db2pq_spark.operators.pca import embedding_moments

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return embedding_moments(emb, "embedding", impl="arrow")

    return {"q36_minhash_dedup": q36, "q37_simhash_dedup": q37,
            "q38_lsh_similarity": q38, "q117_kmeans": q117,
            "q102_duplicate_spans": q102, "q116_span_removal": q116,
            "q119_winnow_overlap": q119, "q118_split_leakage": q118,
            "q121_kneser_ney": q121, "q107_incremental_dedup": q107,
            "q123_winnow_incremental": q123,
            "q125_dsir_sample": q125, "q126_embedding_moments": q126}


def replicate(spark, table: str, out_dir: str, offset: int) -> None:
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    ts_is_long = (table == "events"
                  and dict(df.dtypes)["ts"] in ("bigint", "long"))
    parts = []
    for i in range(COPIES):
        c = df
        for key in KEY_SHIFTS.get(table, []):
            c = c.withColumn(key, F.col(key) + F.lit(i * offset))
        if table == "events":
            # shift by 31 days per copy, in whichever unit ts carries
            c = (c.withColumn("ts", F.col("ts") + F.lit(i * _MONTH_NS))
                 if ts_is_long else
                 c.withColumn("ts", F.col("ts")
                              + F.expr(f"INTERVAL '{i * 31}' DAY")))
        if table == "documents" and i > 0:
            # per-copy token suffix: replicas stop being near-dups of
            # each other (see module docstring)
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1_c{i}"))
        if table == "embeddings" and i > 0:
            # per-copy Rademacher sign pattern: norm-preserving,
            # decorrelates replicas (expected cross-copy cosine ≈ 0)
            idx = F.sequence(F.lit(0), F.size("embedding") - 1)
            c = c.withColumn(
                "embedding",
                F.zip_with(
                    "embedding", idx,
                    lambda x, d: F.when(
                        F.xxhash64(d, F.lit(i))
                         .bitwiseAND(F.lit(1)) == 1, x).otherwise(-x)))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def main() -> None:
    from db2pq_spark import workload
    from db2pq_spark.session import get_spark

    spark = get_spark(app_name="scale_smoke",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    # events carries ns timestamps (read as epoch-nanos longs, as in
    # workload.t)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # SMOKE_REPLICA_DIR: reuse a replica prebuilt by
    # scripts/build_replica.py (same replicate() code) — skips the
    # ~10 min build and keeps it for later perf iteration
    prebuilt = os.environ.get("SMOKE_REPLICA_DIR")
    big = prebuilt or tempfile.mkdtemp(prefix="sf1_replica_")
    offset = 100_000_000

    t0 = time.perf_counter()
    for tbl in ("lineitem", "orders", "customer", "supplier", "part",
                "nation", "region", "documents", "embeddings", "events"):
        if prebuilt and os.path.exists(f"{big}/{tbl}.parquet/_SUCCESS"):
            continue
        if tbl in KEY_SHIFTS:
            replicate(spark, tbl, big, offset)
        else:
            # dimensions/fixtures stay as-is (broadcast sides)
            spark.read.parquet(f"{SF_DIR}/{tbl}.parquet") \
                .write.mode("overwrite").parquet(f"{big}/{tbl}.parquet")
    build_s = time.perf_counter() - t0

    rows_small = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    rows_big = spark.read.parquet(f"{big}/lineitem.parquet").count()
    overrides = _overrides()

    def run_all(sf_dir: str) -> dict[str, list[float]]:
        # min of N steady runs: single-shot steady timings on this box
        # swing several × run-to-run (GC pauses, page-cache misses on
        # the freshly-written replica), which fabricates phantom
        # super-linear ratios; the minimum is the standard
        # noise-robust estimator for a fixed workload. ALL runs are
        # recorded (JSON sidecar) so the spread is visible, and at big
        # copy factors a >1.5× disagreement between the first two runs
        # triggers a third — min-of-2 under heap pressure has twice
        # shipped numbers that didn't reproduce.
        out = {}

        def cleanup():
            # between EVERY run, not just every query: operators that
            # stage intermediates (minhash, the span/winnow families)
            # build NEW cache/checkpoint blocks per invocation, and at
            # 100× three stacked generations of them pressure storage
            # memory enough to inflate the very runs being measured
            # (clearCache handles CacheManager entries; the gc pass
            # lets the ContextCleaner release localCheckpoint blocks)
            spark.catalog.clearCache()
            import gc
            gc.collect()

        for name in QUERIES:
            fn = overrides.get(name) or workload.REGISTRY[name][0]
            fn(spark, sf_dir).collect()          # warm (codegen)
            cleanup()
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                times.append(round(time.perf_counter() - t0, 3))
                cleanup()
            if (COPIES >= 100 and len(times) == 2
                    and max(times) > 1.5 * min(times)):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                times.append(round(time.perf_counter() - t0, 3))
                cleanup()
            out[name] = times
        return out

    small = run_all(SF_DIR)
    large = run_all(big)

    out_md = ("/root/repo/SCALE_SMOKE.md" if COPIES == 10
              else f"/root/repo/SCALE_SMOKE_{COPIES}x.md")
    lines = [
        f"# SCALE_SMOKE — {COPIES}× replica run (auto-generated)\n",
        f"\nlineitem rows: {rows_small:,} (sf0.1) → {rows_big:,} "
        f"({COPIES}× replica; join keys shifted, document text and "
        f"embeddings perturbed per copy so duplicate/near-dup structure "
        f"grows linearly); replica build {build_s:.0f}s. Steady-state "
        f"timings (codegen warmed, min of ≥{RUNS} — every run recorded "
        f"in the .json sidecar next to this file), local[32]. "
        f"Dedup/ANN rows run production operator configs "
        f"(see script docstring).\n",
        f"\n| query | sf0.1 s | {COPIES}× s | ratio |\n|---|---|---|---|\n",
    ]
    sidecar = {}
    for name in QUERIES:
        ms, mb = min(small[name]), min(large[name])
        r = mb / ms if ms > 0 else float("inf")
        lines.append(f"| {name} | {ms} | {mb} | {r:.1f}× |\n")
        sidecar[name] = {"runs_small": small[name],
                         "runs_big": large[name],
                         "min_small": ms, "min_big": mb,
                         "ratio": round(r, 2)}
    lines.append(
        f"\nA ratio ≲ {COPIES}× means the plan scales at-or-better than "
        "linearly in rows (broadcast dims unchanged, partial aggs "
        "absorb the fan-in); super-linear ratios would flag a shuffle "
        "or skew problem to fix. Per-run times (spread, not just the "
        "min) are in the committed sidecar JSON.\n")
    with open(out_md, "w") as fh:
        fh.writelines(lines)
    import json
    with open(out_md.replace(".md", ".json"), "w") as fh:
        json.dump({"copies": COPIES, "lineitem_rows": rows_big,
                   "queries": sidecar}, fh, indent=1)
    print(f"wrote {out_md} (+ .json sidecar, lineitem {rows_big:,} rows)")
    for name in QUERIES:
        print(f"  {name}: {min(small[name])}s -> {min(large[name])}s")
    if not prebuilt:
        import shutil
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
