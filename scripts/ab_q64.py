#!/usr/bin/env python
"""A/B the q64 round-10 rewrite (commit 6a987bf): the explicit
orderkey pre-partition + NOT-NULL prefilter ("new") vs the plain
aggregate chain that lets Catalyst key each aggregate itself ("old").

The round-10 verdict flagged that the rewrite shipped without a
demonstrated win (committed artifacts read flat at both scales while
the commit message claimed 34.3 s → 14.8 s at 100×) — this script is
the controlled comparison: each (shape, scale) measured in its OWN
fresh worker process (no session aging), noop sink (the smoke's
methodology), warm + min-of-N with the extend-while-descending rule.

Usage:  python scripts/ab_q64.py [replica_dir]
        (replica_dir defaults to /tmp/sf_replica_100x when present;
         pass 'small-only' to skip the big scale)
Prints a JSON record; paste the verdict into SCALE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
RUNS = 3
MAX_RUNS = 6


def _q64_shape(spark, sf_dir: str, new: bool):
    from pyspark.sql import functions as F

    from db2pq_spark.workload_base import t

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    if new:
        li = li.where(F.col("l_orderkey").isNotNull()
                      & F.col("l_suppkey").isNotNull()
                      & F.col("l_shipdate").isNotNull())
    o = t(spark, sf_dir, "orders") \
        .where(F.col("o_orderstatus") == "F").select("o_orderkey")
    lf = li.join(o, li.l_orderkey == o.o_orderkey).drop("o_orderkey")
    if new:
        lf = lf.repartition("l_orderkey")
    lc = lf.groupBy("l_orderkey", "l_suppkey", "l_shipdate") \
        .agg(F.count("*").alias("cnt"))
    supp = lc.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smax"))
    agg1 = supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.max(F.struct("smax", "l_suppkey")).alias("_top"))
    supp2 = supp.join(agg1.where(F.col("n_supp") > 1), "l_orderkey")
    per_o = supp2.groupBy("l_orderkey").agg(
        F.first(F.col("_top.smax")).alias("m1"),
        F.first(F.col("_top.l_suppkey")).alias("top_sk"),
        F.max(F.when(F.col("l_suppkey") != F.col("_top.l_suppkey"),
                     F.col("smax"))).alias("m2alt"))
    j = lc.join(per_o, "l_orderkey")
    max_other = F.when(F.col("l_suppkey") == F.col("top_sk"),
                       F.col("m2alt")).otherwise(F.col("m1"))
    waiting = (j.where(F.col("l_shipdate") >= max_other)
               .groupBy("l_suppkey")
               .agg(F.sum("cnt").alias("numwait")))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (waiting.join(F.broadcast(s),
                         waiting.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.sum("numwait").alias("numwait"))
            .select("s_name",
                    F.col("numwait").cast("bigint").alias("numwait")))


def _worker_main() -> None:
    from db2pq_spark.session import get_spark

    sf_dir = os.environ["AB_SF"]
    new = os.environ["AB_SHAPE"] == "new"
    spark = get_spark(app_name="ab_q64_worker",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.read.parquet(f"{sf_dir}/supplier.parquet").count()

    def run_once():
        t0 = time.perf_counter()
        _q64_shape(spark, sf_dir, new) \
            .write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def cleanup():
        spark.catalog.clearCache()
        import gc
        gc.collect()

    run_once()  # warm (codegen)
    cleanup()
    times = []
    for _ in range(RUNS):
        times.append(run_once())
        cleanup()
    while (len(times) < MAX_RUNS
           and (times[-1] == min(times)
                or max(times[-3:]) > 1.5 * min(times[-3:]))):
        times.append(run_once())
        cleanup()
    with open(os.environ["AB_OUT"], "w") as fh:
        json.dump({"runs": times, "min": min(times),
                   "load": round(os.getloadavg()[0], 2)}, fh)
    spark.stop()


def _measure(shape: str, sf_dir: str) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as fh:
        out_path = fh.name
    env = dict(os.environ, AB_SHAPE=shape, AB_SF=sf_dir, AB_OUT=out_path)
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"worker {shape}@{sf_dir} failed")
    with open(out_path) as fh:
        res = json.load(fh)
    os.unlink(out_path)
    return res


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else None
    big = None if arg == "small-only" else (arg or "/tmp/sf_replica_100x")
    if big and not os.path.exists(f"{big}/lineitem.parquet/_SUCCESS"):
        print(f"no replica at {big}; run scripts/build_replica.py first "
              f"or pass 'small-only'", file=sys.stderr)
        sys.exit(1)
    out: dict = {}
    scales = [("sf0.1", SF_DIR)] + ([("100x", big)] if big else [])
    for label, sf_dir in scales:
        for shape in ("old", "new"):
            print(f"measuring {shape} @ {label} ...", flush=True)
            out[f"{shape}_{label}"] = _measure(shape, sf_dir)
    print(json.dumps(out, indent=1))
    for label, _ in scales:
        o, n = out[f"old_{label}"]["min"], out[f"new_{label}"]["min"]
        print(f"{label}: old {o}s  new {n}s  -> new/old "
              f"{n / o:.2f}x")


if __name__ == "__main__":
    if os.environ.get("AB_OUT"):
        _worker_main()
    else:
        main()
