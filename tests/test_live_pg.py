"""Live-PostgreSQL integration tests — skip-gated, mirroring the
reference's ``local_pg`` marker (reference tests/conftest.py:60-64,
pyproject.toml:58-62): they run only when a reachable server is
configured, so CI sandboxes without a database skip cleanly while a
real deployment gets end-to-end verification of the S1-S5/S10-S13/X1-X3
/Y6 rows that unit tests can only mock.

Enable with the standard libpq environment:

    PGHOST=localhost [PGPORT=5432] [PGDATABASE=postgres]
    [PGUSER=postgres] [PGPASSWORD=...] python -m pytest tests/test_live_pg.py

Additionally requires the PostgreSQL JDBC driver jar on Spark's
classpath (spark.jars / --packages org.postgresql:postgresql) and, for
the binary-COPY test, psycopg importable in the Python workers.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("PGHOST"),
    reason="live-PG tests are opt-in: set PGHOST (libpq env)",
)


def _reachable(host: str, port: int) -> bool:
    try:
        with socket.create_connection((host, port), timeout=2):
            return True
    except OSError:
        return False


@pytest.fixture(scope="module")
def live_source():
    from db2pq_spark.sources.jdbc import JdbcSource

    host = os.environ["PGHOST"]
    port = int(os.environ.get("PGPORT", "5432"))
    if not _reachable(host, port):
        pytest.skip(f"PGHOST {host}:{port} not reachable")
    db = os.environ.get("PGDATABASE", "postgres")
    return JdbcSource(
        url=f"jdbc:postgresql://{host}:{port}/{db}",
        user=os.environ.get("PGUSER", "postgres"),
        password=os.environ.get("PGPASSWORD"),
    )


@pytest.fixture(scope="module")
def pg_schema(spark, live_source):
    """A throwaway server-side schema; dropped (cascade) afterwards."""
    from db2pq_spark.sources.jdbc import execute_sql

    name = f"sgtest_{uuid.uuid4().hex[:8]}"
    try:
        execute_sql(spark, live_source, f'CREATE SCHEMA "{name}"')
    except Exception as exc:  # noqa: BLE001 — driver jar missing, auth, …
        pytest.skip(f"cannot execute DDL against live PG: {exc}")
    yield name
    try:
        execute_sql(spark, live_source,
                    f'DROP SCHEMA "{name}" CASCADE')
    except Exception:  # noqa: BLE001 — teardown is best-effort
        pass


class TestLiveRoundTrips:
    def test_db_to_pq_roundtrip(self, spark, live_source, pg_schema,
                                tmp_path):
        from db2pq_spark.core import Engine
        from db2pq_spark.sources.jdbc import execute_sql

        execute_sql(spark, live_source,
                    f'CREATE TABLE "{pg_schema}".src '
                    "(id bigint PRIMARY KEY, name text, amt numeric(12,2))")
        execute_sql(spark, live_source,
                    f'INSERT INTO "{pg_schema}".src VALUES '
                    "(1, 'a', 10.50), (2, 'b', NULL), (3, NULL, -4.25)")
        eng = Engine(spark, tmp_path)
        eng.db_to_pq(live_source, pg_schema, "src")
        got = {tuple(r) for r in
               eng.read_pq(pg_schema, "src")
               .select("id", "name", F.col("amt").cast("string"))
               .collect()}
        assert got == {(1, "a", "10.50"), (2, "b", None),
                       (3, None, "-4.25")}

    def test_pq_to_db_jdbc_roundtrip(self, spark, live_source, pg_schema,
                                     tmp_path):
        from db2pq_spark.core import Engine
        from db2pq_spark.sources.jdbc import jdbc_read_options, read_jdbc

        eng = Engine(spark, tmp_path)
        df = spark.createDataFrame(
            [(1, "x"), (2, "y")], "id long, name string")
        eng.df_to_pq(df, pg_schema, "t_jdbc")
        eng.pq_to_db(pg_schema, "t_jdbc", live_source)
        back = read_jdbc(spark, jdbc_read_options(
            live_source,
            sql=f'SELECT id, name FROM "{pg_schema}".t_jdbc'))
        assert {tuple(r) for r in back.collect()} == {(1, "x"), (2, "y")}

    def test_pq_to_db_binary_copy(self, spark, live_source, pg_schema,
                                  tmp_path):
        pytest.importorskip("psycopg")
        from db2pq_spark.core import Engine
        from db2pq_spark.sources.jdbc import (
            execute_sql,
            jdbc_read_options,
            read_jdbc,
        )

        execute_sql(spark, live_source,
                    f'CREATE TABLE "{pg_schema}".t_copy '
                    "(id bigint, name text, amt double precision)")
        eng = Engine(spark, tmp_path)
        df = spark.createDataFrame(
            [(1, "x", 1.5), (2, None, None)],
            "id long, name string, amt double")
        eng.df_to_pq(df, pg_schema, "t_copy")
        eng.pq_to_db(pg_schema, "t_copy", live_source,
                     mode="append", method="copy")
        back = read_jdbc(spark, jdbc_read_options(
            live_source,
            sql=f'SELECT id, name, amt FROM "{pg_schema}".t_copy'))
        assert {tuple(r) for r in back.collect()} == \
            {(1, "x", 1.5), (2, None, None)}

    def test_comment_read_and_conditional_update(self, spark, live_source,
                                                 pg_schema, tmp_path):
        """Y6 + Y3: the reference's freshness protocol — table comment
        carries 'Last modified:', the conditional exporter reads it."""
        from db2pq_spark.compat import _get_pg_comment
        from db2pq_spark.sources.jdbc import execute_sql

        execute_sql(spark, live_source,
                    f'CREATE TABLE "{pg_schema}".c (id int)')
        stamp = "Last modified: 02/03/2025 04:05:06"
        execute_sql(spark, live_source,
                    f'COMMENT ON TABLE "{pg_schema}".c IS \'{stamp}\'')
        assert _get_pg_comment(live_source, pg_schema, "c") == stamp
