"""TPC-H wide battery (the remaining classic shapes), UDTF/UDAF
surfaces, dup clusters, interval joins, unpivot/variant, chunking
and packing, resample/gap-fill, feature binning."""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf resolves the postponed
# 'pd.Series' annotations against this module's globals

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from db2pq_spark.workload_base import (  # noqa: F401
    _NORM,
    _TOKENS,
    REGISTRY,
    QueryFn,
    _dsum_sql,
    dsum,
    query,
    t,
)

# ---------------------------------------------------------------------------
# TPC-H wide battery (the remaining classic shapes) + UDTF / UDAF surfaces
# ---------------------------------------------------------------------------

_Q70_SQL = """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
"""


@query("q70_priority_exists", oracle=_Q70_SQL)
def q70_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS against the fact table → Catalyst rewrites
    to a left-semi join on l_orderkey; the date filter is pushed to the
    orders scan, so the semi join probes only the 6-month slice."""
    for name in ("orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q70_SQL)


_Q71_REV = "l.l_extendedprice * (1 - l.l_discount)"

_Q71_SQL = f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_dsum_sql(_Q71_REV, 4)} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
"""


@query("q71_volume_shipping", oracle=_Q71_SQL)
def q71_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bi-directional nation-pair trade volume by year.
    DataFrame build: nation joined twice under different aliases; all
    dimensions broadcast, the only shuffle is lineitem⋈orders + the
    final aggregation. The OR-pair predicate lands after both nation
    joins, where it prunes to the two nation pairs."""
    li = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    s = t(spark, sf_dir, "supplier").alias("s")
    n = t(spark, sf_dir, "nation")
    nc, ns = n.alias("nc"), n.alias("ns")
    supp_n, cust_n = F.col("ns.n_name"), F.col("nc.n_name")
    return (
        li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(F.broadcast(c), F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(F.broadcast(s), F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .join(F.broadcast(nc), F.col("nc.n_nationkey") == F.col("c.c_nationkey"))
        .join(F.broadcast(ns), F.col("ns.n_nationkey") == F.col("s.s_nationkey"))
        .where(((supp_n == "NATION_1") & (cust_n == "NATION_2"))
               | ((supp_n == "NATION_2") & (cust_n == "NATION_1")))
        .groupBy(supp_n.alias("supp_nation"), cust_n.alias("cust_nation"),
                 F.year("l.l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum(F.col("l.l_extendedprice") * (1 - F.col("l.l_discount")),
                  4, "revenue"))
    )


_Q72_SQL = """
    WITH sales AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
               AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,4)) END)
                     AS DECIMAL(38,4)) AS DOUBLE)
           / CAST(CAST(SUM(volume) AS DECIMAL(38,4)) AS DOUBLE) AS mkt_share
    FROM sales
    GROUP BY o_year
"""


@query("q72_market_share", oracle=_Q72_SQL)
def q72_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of regional order volume per
    year, as a conditional-sum ratio (one aggregation, no self-join).
    Both sums accumulate in exact decimal; the final division sees
    identical IEEE operands in Spark and DuckDB."""
    for name in ("lineitem", "part", "orders", "customer", "nation",
                 "region", "supplier"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q72_SQL)


_Q73_SQL = """
    SELECT ns.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity
                           * CAST(0.1 AS DOUBLE)
                         AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
"""


@query("q73_product_profit", oracle=_Q73_SQL)
def q73_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year (supply cost
    proxied as 10% of retail price — the fixture has no partsupp).
    Filter on p_name prunes parts before the fact join; supplier,
    part, nation broadcast."""
    for name in ("lineitem", "supplier", "part", "orders", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q73_SQL)


_Q74_SQL = f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_dsum_sql(_Q71_REV, 4)} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query("q74_returned_items", oracle=_Q74_SQL)
def q74_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. DataFrame build; revenue is an exact decimal so the
    DESC + custkey ordering is total and engine-independent. The final
    top-20 is a TakeOrderedAndProject — no global sort materializes."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")))
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  4, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q75_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
"""


@query("q75_customer_distribution", oracle=_Q75_SQL)
def q75_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a filtered left outer
    join (customers with zero qualifying orders must appear as
    c_count=0). First groupBy shuffles on c_custkey; the second input is
    tiny (distinct counts), coalesced by AQE."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q76_SQL = """
    SELECT CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END)
                     AS DECIMAL(38,4)) AS DOUBLE)
         / CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
           AS promo_share,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


@query("q76_promo_share", oracle=_Q76_SQL)
def q76_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share for one month — global
    (ungrouped) conditional aggregate; the month filter pushes to the
    lineitem scan and part broadcasts."""
    for name in ("lineitem", "part"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q76_SQL)


_Q77_SQL = """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM lineitem l2
                           GROUP BY l2.l_orderkey
                           HAVING SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                                  > 250)
    GROUP BY 1, 2, 3, 4
"""


@query("q77_large_volume_customer", oracle=_Q77_SQL)
def q77_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    via IN over a grouped-HAVING subquery → semi join against a partial
    aggregate of the same fact table. Exact decimal sums keep the
    HAVING cut identical across engines."""
    for name in ("customer", "orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q77_SQL)


_Q78_SQL = f"""
    SELECT {_dsum_sql(_Q71_REV, 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 5 AND 20)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
"""


@query("q78_disjunctive_predicates", oracle=_Q78_SQL)
def q78_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of three conjunctive brand/size/quantity
    bands across the join. DataFrame build: the disjunction references
    both sides so it evaluates post-join; part broadcasts and the
    common p_partkey equi-key keeps the join hash-based."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    band = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(5, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(band)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  4, "revenue"),
             F.count("*").alias("n_items"))
    )


_Q79_SQL = """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_size IN (1, 5, 11, 20, 28, 37)
      AND l.l_suppkey NOT IN (SELECT s.s_suppkey FROM supplier s
                              WHERE s.s_acctbal < 0)
    GROUP BY 1, 2, 3
"""


@query("q79_supplier_count", oracle=_Q79_SQL)
def q79_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute with
    a NOT IN exclusion list → null-aware anti join against the (tiny,
    broadcast) supplier blocklist, then a two-phase distinct
    aggregation (partial distinct before the shuffle)."""
    for name in ("lineitem", "part", "supplier"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q79_SQL)


@query(
    "q80_udtf_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
          FROM documents
          WHERE text IS NOT NULL
            AND octet_length(encode(text)) = length(text)) u
    WHERE token <> ''
    GROUP BY token
    """,
)
def q80_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table-valued function) surface: a tokenizer that
    emits one row per token, consumed through a LATERAL join and
    aggregated into corpus token counts. Restricted to ASCII documents
    so Python ``str.lower``/split and the oracle's ``lower``/
    ``string_split`` agree byte-for-byte. The UDTF runs
    partition-parallel; only the count aggregation shuffles.
    [extension — reference has no UDF/UDTF surface, SURVEY §2.12]"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string")
    class SpaceTokenize:
        def eval(self, text: str):
            if text is None:
                return
            for tok in text.lower().split(" "):
                if tok:
                    yield (tok,)

    spark.udtf.register("space_tokenize", SpaceTokenize)
    docs = t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & (F.octet_length(F.col("text")) == F.length(F.col("text"))))
    docs.createOrReplaceTempView("docs_ascii")
    return spark.sql("""
        SELECT tk.token, COUNT(*) AS n
        FROM docs_ascii AS d, LATERAL space_tokenize(d.text) AS tk
        GROUP BY tk.token
    """)


@query(
    "q81_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q81_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (pandas GROUPED_AGG UDAF): Arrow-batched
    per-group reduction in Python. Accumulates in int64 (quantities are
    whole numbers) so the result is exact and order-independent —
    the determinism requirement any distributed UDAF must meet.
    [extension — reference has no UDAF surface, SURVEY §2.12]"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def qty_total_udaf(v: pd.Series) -> int:
        return int(v.astype("int64").sum())

    @pandas_udf("long")
    def row_count_udaf(v: pd.Series) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
        # aggregates in one agg(), so the count is a pandas UDAF too.
        return int(len(v))

    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(qty_total_udaf(F.col("l_quantity")).alias("qty_total"),
                 row_count_udaf(F.col("l_quantity")).alias("n_rows")))


@query(
    "q82_dup_clusters",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
      WHERE text IS NOT NULL AND doc_id < 15
      UNION ALL
      SELECT doc_id + 2000000, text FROM documents
      WHERE text IS NOT NULL AND doc_id < 15
    ), hashed AS (
      SELECT doc_id, md5({_NORM}) AS h
      FROM docs
    ), grp AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY h) AS comp,
             COUNT(*) OVER (PARTITION BY h) AS n
      FROM hashed)
    SELECT doc_id AS id, comp
    FROM grp
    WHERE n >= 2
    """,
)
def q82_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over duplicate pairs → cluster ids.

    The fixture has no natural exact duplicates (a vacuous 0-row check),
    so the corpus is augmented with two clones of each of the first 15
    docs under shifted ids — every group is then a 3-member *chain*
    (each doc linked only to the next doc id with the same content
    hash), so the hash-min iteration genuinely has to propagate labels
    across multiple hops. The oracle computes the fixpoint in closed
    form (min doc_id per content-hash group) — an independent
    derivation the iterative operator must agree with. [extension]"""
    from db2pq_spark.operators.components import dedup_clusters
    from db2pq_spark.operators.dedup import normalize_text

    base = (t(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull()).select("doc_id", "text"))
    docs = base
    for shift in (1_000_000, 2_000_000):
        docs = docs.unionByName(
            base.where(F.col("doc_id") < 15)
            .select((F.col("doc_id") + shift).alias("doc_id"), "text"))
    hashed = docs.select("doc_id", F.md5(normalize_text("text")).alias("h"))
    nxt = F.lead("doc_id").over(
        W.partitionBy("h").orderBy("doc_id"))
    edges = (hashed.select("doc_id", nxt.alias("next_id"))
             .where(F.col("next_id").isNotNull()))
    return dedup_clusters(edges, "doc_id", "next_id")


@query(
    "q83_interval_join",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           CAST(v.ts AS TIMESTAMP) AS view_time,
           CAST(p.ts AS TIMESTAMP) AS purchase_time,
           p.value AS purchase_value
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP)
         <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    WHERE v.event_type = 'view'
      AND p.event_type = 'purchase'
    """,
)
def q83_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (batch twin of the stream-stream attribution join,
    streaming/windows.py:view_purchase_attribution): purchases joined to
    the same user's views within the preceding hour. The equi-key on
    user_id keeps this a hash join with a residual range predicate —
    not a cartesian. [extension]"""
    from db2pq_spark.streaming.windows import view_purchase_attribution

    ev = t(spark, sf_dir, "events").withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us")))
    return view_purchase_attribution(ev)


@query(
    "q84_unpivot",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,4)))
                  AS DECIMAL(38,4)) AS disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric,
           CAST(CAST(amount AS DECIMAL(38,4)) AS DOUBLE) AS amount
    FROM wide
    UNPIVOT (amount FOR metric IN (qty, price, disc))
    """,
)
def q84_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse reshape of q22's pivot: a wide
    per-flag aggregate melted to (flag, metric, amount) rows via the
    native ``unpivot`` operator (an Expand node — no shuffle beyond the
    aggregation). Amounts unify to decimal(38,4) exactly as DuckDB's
    UNPIVOT unifies its value column. [Spark built-in; reference
    delegates reshapes to source SQL]"""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("decimal(38,2)").alias("qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
         .cast("decimal(38,2)").alias("price"),
        F.sum(F.col("l_discount").cast("decimal(18,4)"))
         .cast("decimal(38,4)").alias("disc"),
    )
    return (wide.unpivot("l_returnflag", ["qty", "price", "disc"],
                         "metric", "amount")
            .withColumn("amount",
                        F.col("amount").cast("decimal(38,4)").cast("double")))


@query(
    "q85_chunking",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             GREATEST(1, CAST(ceil((length(text) - 64) / 448.0) AS INT))
               AS n_chunks
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id AS id, CAST(i AS INT) AS chunk_idx,
           substring(text, CAST(i * 448 + 1 AS BIGINT), 512) AS chunk_text,
           CAST(length(substring(text, CAST(i * 448 + 1 AS BIGINT), 512))
                AS INT) AS chunk_chars_
    FROM d, UNNEST(range(0, CAST(n_chunks AS BIGINT))) AS t(i)
    """,
)
def q85_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: overlapping 512-char windows (stride 448) via
    sequence + posexplode + substring — one row in, N out, zero UDFs,
    zero shuffles (a narrow map at any scale). [extension]"""
    from db2pq_spark.operators.chunking import chunk_documents

    return chunk_documents(t(spark, sf_dir, "documents"), "text", "doc_id",
                           chunk_chars=512, overlap=64)


@query(
    "q86_packing",
    oracle="""
    WITH sized AS (
      SELECT doc_id, lang, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS offset_
      FROM documents)
    SELECT doc_id, lang, n_chars,
           CAST(floor(offset_ / 8192) AS BIGINT) AS bin
    FROM sized
    """,
)
def q86_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (offset binning): per-language cumulative size →
    bin = floor(offset/budget). One window cumsum per group; engine- and
    partitioning-independent (the oracle recomputes the same window).
    The exact next-fit variant is pack_next_fit (applyInPandas,
    tested for no-straddle semantics in pytest). [extension]"""
    from db2pq_spark.operators.chunking import pack_offsets

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return pack_offsets(docs, "n_chars", "doc_id", budget=8192,
                        group_col="lang")


@query(
    "q87_variant",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4))
                AS DOUBLE) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q87_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured path: ``parse_json`` once into Spark's
    binary VARIANT encoding, then typed ``variant_get`` extraction —
    the columnar-shredding-friendly alternative to per-access string
    parsing (q53). At scale, parse-once beats N× get_json_object when
    several fields are touched. [Spark 4 built-in; reference delegates
    JSON to source SQL]"""
    e = t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (e.groupBy(k.alias("k"))
            .agg(F.count("*").alias("n"),
                 dsum("value", 4, "sum_value")))


@query(
    "q88_asof_forward",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events WHERE user_id < 20
    ),
    purchases AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT ev.event_id, ev.user_id, ev.ts_us, p.ts_us AS ts_us_asof
    FROM ev ASOF LEFT JOIN purchases p
      ON ev.user_id = p.user_id AND ev.ts_us <= p.ts_us
    """,
)
def q88_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: earliest purchase at-or-after each event
    (next-event attribution). Same one-shuffle union+carry composition
    as q34, time ordering reversed. Oracle: DuckDB ASOF with ``<=``.
    [extension]"""
    from db2pq_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("user_id") < 20).select("event_id", "user_id",
                                                   "ts_us")
    right = ev.filter(F.col("event_type") == "purchase").select("user_id",
                                                                "ts_us")
    return asof_join(left, right, on="user_id",
                     left_time="ts_us", right_time="ts_us",
                     value_cols=["ts_us"], direction="forward")


@query(
    "q89_resample_gapfill",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day_idx,
             value
      FROM events WHERE user_id < 8
    ),
    bounds AS (
      SELECT user_id, MIN(day_idx) AS lo, MAX(day_idx) AS hi
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT b.user_id, CAST(g.d AS BIGINT) AS day_idx
      FROM bounds b, UNNEST(range(b.lo, b.hi + 1)) AS g(d)
    )
    SELECT g.user_id, g.day_idx,
           COALESCE(e.n, 0) AS n_events,
           CAST(COALESCE(e.sv, 0) AS DOUBLE) AS sum_value
    FROM grid g
    LEFT JOIN (SELECT user_id, day_idx, COUNT(*) AS n,
                      CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                           AS DECIMAL(38,4)) AS DOUBLE) AS sv
               FROM ev GROUP BY 1, 2) e
      ON e.user_id = g.user_id AND e.day_idx = g.day_idx
    """,
)
def q89_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: per-user daily rollup
    over a dense day grid (days with no events appear as zero rows).
    The grid is generated from each user's own [min, max] span with
    ``sequence`` + ``explode`` — no driver-side calendar, no cross
    join; the grid build and the left join share the user_id
    partitioning. [extension — hypertable-style rollup]"""
    ev = (t(spark, sf_dir, "events")
          .where(F.col("user_id") < 8)
          .select("user_id",
                  F.expr("ts_us div 86400000000").alias("day_idx"),
                  "value"))
    agg = (ev.groupBy("user_id", "day_idx")
           .agg(F.count("*").alias("n"),
                dsum("value", 4, "sv")))
    grid = (ev.groupBy("user_id")
            .agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
            .select("user_id",
                    F.explode(F.sequence("lo", "hi")).alias("day_idx")))
    return (grid.join(agg, ["user_id", "day_idx"], "left")
            .select("user_id", "day_idx",
                    F.coalesce("n", F.lit(0)).alias("n_events"),
                    F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value")))


@query(
    "q90_feature_binning",
    oracle="""
    SELECT decile, COUNT(*) AS n,
           ROUND(MIN(c_acctbal), 2) AS lo,
           ROUND(MAX(c_acctbal), 2) AS hi
    FROM (SELECT c_acctbal,
                 NTILE(10) OVER (ORDER BY c_acctbal, c_custkey)
                   AS decile
          FROM customer) b
    GROUP BY decile
    """,
)
def q90_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile binning of a feature column (equal-frequency
    discretization): NTILE semantics with a total tie-broken ordering —
    deterministic across engines, unlike approxQuantile-based
    Bucketizer setups — computed as arithmetic over the two-stage
    distributed global rank (operators/ranking.py), so no
    single-partition window at any size. At 100 TB use the sketch
    (approx) variant; this is the exact baseline the sketch is
    validated against. [extension]"""
    from db2pq_spark.operators.ranking import (
        global_rank_with_total,
        ntile_expr,
    )

    c = t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    ranked, n = global_rank_with_total(
        c, [F.asc("c_acctbal"), F.asc("c_custkey")], rank_col="_r")
    return (ranked
            .select("c_acctbal",
                    ntile_expr(F.col("_r"), n, 10)
                    .cast("bigint").alias("decile"))
            .groupBy("decile")
            .agg(F.count("*").alias("n"),
                 F.round(F.min("c_acctbal"), 2).alias("lo"),
                 F.round(F.max("c_acctbal"), 2).alias("hi")))
