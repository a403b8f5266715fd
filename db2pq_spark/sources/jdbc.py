"""JDBC source: planned server-side SELECT + parallel partitioned reads.

Reference behavior (SURVEY §2.1 S1-S5): the planned SELECT (projection,
rename, cast, WHERE, LIMIT) executes **on the source database** so only
kept columns/rows transit the network; Arrow batches stream out sized by
a type-width heuristic (db2pq/postgres/duckdb_pg.py:36-77).

Spark mapping: ``option("query", plan.to_sql(...))`` reproduces the
server-side execution exactly; ``fetchsize`` carries the batch-size
heuristic; ``partitionColumn/lowerBound/upperBound/numPartitions`` add
parallel pull — a capability the single-stream reference lacks and the
piece that matters at 100 TB (N executors × independent range scans).

No database ships in this container, so these builders are exercised by
unit tests on the generated options; the read path itself is standard
``spark.read.format("jdbc")``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from db2pq_spark.plans.plan import QueryPlan

#: reference clamps (db2pq/postgres/duckdb_pg.py:68-77)
MIN_FETCH_ROWS = 5_000
MAX_FETCH_ROWS = 100_000
TARGET_BATCH_BYTES = 8 * 1024 * 1024

#: per-type width guesses in bytes (db2pq/postgres/duckdb_pg.py:36-65)
_WIDTHS = {
    "boolean": 1,
    "int16": 2,
    "int32": 4,
    "date": 4,
    "float32": 4,
    "int64": 8,
    "float64": 8,
    "timestamp": 8,
    "string": 64,
    "binary": 64,
    "json": 128,
    "array": 128,
}


def estimate_row_width(type_names: list[str]) -> int:
    """Estimated bytes/row from engine type names (heuristic parity with
    the reference's 1-128 B/col table)."""
    total = 0
    for name in type_names:
        n = name.lower()
        if n.endswith("[]") or n.startswith("array"):
            total += _WIDTHS["array"]
        elif n.startswith("decimal") or n.startswith("numeric"):
            total += 16
        elif "json" in n or "xml" in n:
            total += _WIDTHS["json"]
        else:
            total += _WIDTHS.get(n, 32)
    return max(total, 1)


def estimate_fetch_size(type_names: list[str]) -> int:
    """Rows per fetch targeting ~8 MiB, clamped to [5 000, 100 000]
    (db2pq/postgres/duckdb_pg.py:68-77)."""
    rows = TARGET_BATCH_BYTES // estimate_row_width(type_names)
    return int(min(MAX_FETCH_ROWS, max(MIN_FETCH_ROWS, rows)))


@dataclass(frozen=True)
class JdbcSource:
    """Connection descriptor. ``url`` is a full JDBC URL
    (``jdbc:postgresql://host:port/db``); credentials via properties."""

    url: str
    user: str | None = None
    password: str | None = None
    driver: str = "org.postgresql.Driver"

    def base_options(self) -> dict[str, str]:
        opts = {"url": self.url, "driver": self.driver}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        return opts


#: WRDS fixed endpoint (reference db2pq/core.py:493,504-506)
WRDS_URL = "jdbc:postgresql://wrds-pgdata.wharton.upenn.edu:9737/wrds?sslmode=require"


def jdbc_read_options(
    source: JdbcSource,
    plan: QueryPlan | None = None,
    schema: str | None = None,
    table: str | None = None,
    sql: str | None = None,
    type_names: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Build the full option map for a JDBC read.

    Exactly one of (plan+schema+table), sql, or (schema+table) selects
    the relation. With a plan, the generated SELECT executes server-side
    — projection/cast/filter/limit pushdown guaranteed regardless of
    Catalyst (reference semantics, db2pq/postgres/select_sql.py:107-155).
    """
    opts = source.base_options()
    if plan is not None:
        if not (schema and table):
            raise ValueError("plan requires schema and table")
        opts["query"] = plan.to_sql(f'"{schema}"."{table}"')
    elif sql is not None:
        opts["query"] = sql
    elif schema and table:
        opts["dbtable"] = f'"{schema}"."{table}"'
    else:
        raise ValueError("need plan, sql, or schema+table")

    opts["fetchsize"] = str(estimate_fetch_size(type_names or []))

    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned read requires explicit bounds "
                "(lower_bound/upper_bound on the partition column)")
        if plan is not None and plan.obs is not None:
            raise ValueError(
                "LIMIT (obs) cannot be pushed into a partitioned read — "
                "each partition would re-execute it independently")
        if "query" in opts:
            # Spark requires dbtable for partitioned reads; wrap the query.
            opts["dbtable"] = f"({opts.pop('query')}) AS sub"
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions or 8),
        )
    return opts


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    return spark.read.format("jdbc").options(**options).load()


def write_jdbc(
    df: DataFrame,
    source: JdbcSource,
    schema: str,
    table: str,
    mode: str = "overwrite",
    truncate: bool = False,
    batchsize: int = 10_000,
) -> None:
    """Parquet→PostgreSQL reverse path (reference S10/S11,
    db2pq/postgres/update.py:140-231): Spark creates the table from the
    DataFrame schema then batch-INSERTs per partition. For bulk loads
    into an existing table, the binary-COPY fast path
    (:func:`db2pq_spark.sinks.pg_copy.write_pg_copy`, reference
    db2pq/postgres/copy.py) streams 5-10× faster."""
    (
        df.write.format("jdbc")
        .options(**source.base_options())
        .option("dbtable", f'"{schema}"."{table}"')
        .option("truncate", str(truncate).lower())
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def execute_sql(spark: SparkSession, source: JdbcSource, sql: str) -> bool:
    """DDL/DML statement passthrough (reference process_sql,
    db2pq/postgres/update.py:27-68; X1/X2 in SURVEY §2.10).

    Spark's DataFrame JDBC surface cannot express bare statements
    (COMMENT ON, CREATE SCHEMA, GRANT ...), so this drives
    ``java.sql.DriverManager`` on the driver JVM directly — same
    classpath, no extra Python DB dependency. Returns the JDBC
    ``execute`` result (True when a ResultSet was produced)."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    if source.user:
        props.setProperty("user", source.user)
    if source.password:
        props.setProperty("password", source.password)
    jvm.java.lang.Class.forName(source.driver)
    conn = jvm.java.sql.DriverManager.getConnection(source.url, props)
    try:
        stmt = conn.createStatement()
        try:
            return bool(stmt.execute(sql))
        finally:
            stmt.close()
    finally:
        conn.close()
