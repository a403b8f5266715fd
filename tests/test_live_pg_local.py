"""Live-PostgreSQL validation against a scratch LOCAL server.

``tests/test_live_pg.py`` (the PGHOST-gated mirror of the reference's
``local_pg`` marker) exercises the Spark JDBC paths end-to-end, but it
needs the PostgreSQL JDBC driver jar and psycopg — neither ships in
this container. What DOES ship is the server itself (``initdb`` /
``pg_ctl`` / ``psql``), which is enough to live-verify everything this
engine *generates* for PostgreSQL:

- identifier quoting (P6) — weird schema/table names round-trip;
- the binary ``COPY ... FROM STDIN (FORMAT BINARY)`` statement built by
  ``pg_copy.copy_sql`` is accepted by a real server (fed the documented
  19-byte header + end-of-data trailer through psql);
- the ``COMMENT ON TABLE`` statement built by ``set_table_comment`` and
  the ``obj_description`` read query used by ``_get_pg_comment`` (Y6)
  agree against live catalogs, including quote escaping;
- ``jdbc_url_to_dsn``'s conninfo output — including password quoting —
  is parsed and accepted by real libpq (psql uses the same parser);
- every PG type name in the ``_SPARK_TO_PG`` mapping resolves on a real
  server (``::regtype``);
- ``CREATE SCHEMA IF NOT EXISTS`` (X2's DDL) is valid and idempotent.

The cluster boots on a private unix socket + 127.0.0.1 high port under
/tmp (trust auth, --no-sync) and is destroyed afterwards. Everything
skips cleanly when the server binaries are absent (the pre-round-6
status quo). The Spark-side JDBC/psycopg wiring remains covered by the
mocked suites + the PGHOST-gated tests; see COVERAGE.md.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
import tempfile
import uuid

import pytest

_BINARIES = ("initdb", "pg_ctl", "psql", "runuser")
_PORT = 54937

pytestmark = pytest.mark.skipif(
    any(shutil.which(b) is None for b in _BINARIES),
    reason="local PostgreSQL server binaries not available",
)

#: the documented PGCOPY binary signature + flags + extension length,
#: followed by the -1 int16 end-of-data trailer — a valid zero-row
#: binary COPY payload (PostgreSQL docs, COPY BINARY format)
_EMPTY_BINARY_COPY = b"PGCOPY\n\377\r\n\0" + struct.pack("!ii", 0, 0) \
    + struct.pack("!h", -1)


def _psql(conninfo: str, sql: str, stdin: bytes | None = None) -> str:
    out = subprocess.run(
        ["psql", conninfo, "-X", "-A", "-t", "-v", "ON_ERROR_STOP=1",
         "-c", sql],
        input=stdin, capture_output=True, timeout=30)
    if out.returncode != 0:
        raise RuntimeError(out.stderr.decode(errors="replace"))
    return out.stdout.decode(errors="replace").strip()


@pytest.fixture(scope="module")
def pg():
    """Boot a throwaway cluster as the unprivileged postgres user
    (initdb refuses root); yield its libpq conninfo."""
    base = tempfile.mkdtemp(prefix=f"sgpg_{uuid.uuid4().hex[:6]}_")
    sock = f"{base}/sock"
    data = f"{base}/data"
    try:
        subprocess.run(["mkdir", "-p", sock], check=True)
        subprocess.run(["chown", "-R", "postgres:postgres", base],
                       check=True)
        r = subprocess.run(
            ["runuser", "-u", "postgres", "--", "initdb", "-D", data,
             "-U", "sgtest", "--auth=trust", "--no-sync"],
            capture_output=True, timeout=120)
        if r.returncode != 0:
            pytest.skip(f"initdb failed: {r.stderr.decode()[:200]}")
        r = subprocess.run(
            ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
             "-l", f"{base}/log", "-w", "-o",
             f"-k {sock} -p {_PORT} -c listen_addresses=127.0.0.1",
             "start"],
            capture_output=True, timeout=120)
        if r.returncode != 0:
            pytest.skip(f"pg_ctl start failed: {r.stderr.decode()[:200]}")
        yield {
            "conninfo": f"host={sock} port={_PORT} user=sgtest "
                        f"dbname=postgres",
            "tcp_host": "127.0.0.1", "port": _PORT, "user": "sgtest",
        }
    finally:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
             "-w", "-m", "immediate", "stop"],
            capture_output=True, timeout=60)
        shutil.rmtree(base, ignore_errors=True)


class TestIdentifierQuoting:
    def test_weird_identifiers_roundtrip(self, pg):
        from db2pq_spark.sinks.pg_copy import quote_ident

        schema = 'sg test"x'
        table = "we:ird.tab le"
        qs, qt = quote_ident(schema), quote_ident(table)
        _psql(pg["conninfo"], f"CREATE SCHEMA {qs}")
        _psql(pg["conninfo"],
              f"CREATE TABLE {qs}.{qt} (id int4, name text)")
        _psql(pg["conninfo"],
              f"INSERT INTO {qs}.{qt} VALUES (1, 'a''b')")
        got = _psql(pg["conninfo"], f"SELECT name FROM {qs}.{qt}")
        assert got == "a'b"
        found = _psql(
            pg["conninfo"],
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = 'sg test\"x'")
        assert found == table


class TestCopySql:
    def test_generated_copy_statement_accepted(self, pg):
        # the exact statement each executor partition runs, fed the
        # documented zero-row binary payload through real psql
        from db2pq_spark.sinks.pg_copy import copy_sql

        _psql(pg["conninfo"], "CREATE SCHEMA copysmoke")
        _psql(pg["conninfo"],
              "CREATE TABLE copysmoke.t (a int8, b text)")
        sql = copy_sql("copysmoke", "t", ["a", "b"])
        _psql(pg["conninfo"], sql, stdin=_EMPTY_BINARY_COPY)
        assert _psql(pg["conninfo"],
                     "SELECT count(*) FROM copysmoke.t") == "0"

    def test_binary_format_signature_roundtrip(self, pg):
        # server's own binary COPY output carries the same signature the
        # empty payload used — the framing contract is the documented one
        out = subprocess.run(
            ["psql", pg["conninfo"], "-X", "-v", "ON_ERROR_STOP=1",
             "-c", "COPY (SELECT 1::int8) TO STDOUT (FORMAT BINARY)"],
            capture_output=True, timeout=30)
        assert out.returncode == 0
        assert out.stdout.startswith(b"PGCOPY\n\377\r\n\0")


class TestComments:
    def test_comment_write_and_read_queries_agree(self, pg):
        # write side: the literal-escaped COMMENT ON TABLE text that
        # set_table_comment builds (compat.py:544-557); read side: the
        # obj_description query _get_pg_comment issues (compat.py:79-92)
        _psql(pg["conninfo"], "CREATE SCHEMA cmt")
        _psql(pg["conninfo"], 'CREATE TABLE cmt."Tab" (x int)')
        comment = "Last modified: 01/31/2026 10:00:00 — it's 'quoted'"
        lit = "'" + comment.replace("'", "''") + "'"
        _psql(pg["conninfo"],
              f'COMMENT ON TABLE "cmt"."Tab" IS {lit}')
        read_sql = ("SELECT obj_description(to_regclass("
                    "'\"cmt\".\"Tab\"'), 'pg_class') AS comment")
        assert _psql(pg["conninfo"], read_sql) == comment
        # NULL arm clears it
        _psql(pg["conninfo"], 'COMMENT ON TABLE "cmt"."Tab" IS NULL')
        assert _psql(pg["conninfo"], read_sql) == ""


class TestDsn:
    def test_jdbc_url_to_dsn_accepted_by_libpq(self, pg):
        from db2pq_spark.sinks.pg_copy import jdbc_url_to_dsn

        url = (f"jdbc:postgresql://{pg['tcp_host']}:{pg['port']}/postgres"
               f"?connectTimeout=5&loginTimeout=7&ssl=false")
        dsn = jdbc_url_to_dsn(url, user=pg["user"],
                              password="we ird'pa\\ss")
        # trust auth ignores the password, but libpq must PARSE the
        # conninfo — unescaped quotes/backslashes would fail here
        assert _psql(dsn, "SELECT 41 + 1") == "42"

    def test_socket_dir_host_accepted(self, pg):
        # libpq host=<dir> (socket) form — what a colocated executor
        # would use; validates _quote_conninfo_value on path values
        from db2pq_spark.sinks.pg_copy import _quote_conninfo_value

        sock = pg["conninfo"].split()[0].split("=", 1)[1]
        dsn = (f"host={_quote_conninfo_value(sock)} port={pg['port']} "
               f"user={pg['user']} dbname=postgres")
        assert _psql(dsn, "SELECT 1") == "1"


class TestTypeMapping:
    def test_every_mapped_pg_type_exists(self, pg):
        from db2pq_spark.sinks.pg_copy import _SPARK_TO_PG

        for spark_t, pg_t in _SPARK_TO_PG.items():
            got = _psql(pg["conninfo"], f"SELECT '{pg_t}'::regtype")
            assert got, (spark_t, pg_t)

    def test_mapped_types_accept_spark_shaped_values(self, pg):
        # a table typed exactly as pg_type_for would create it ingests
        # representative values for every mapped Spark type
        from db2pq_spark.sinks.pg_copy import _SPARK_TO_PG

        cols = ", ".join(f"c_{s.replace('_', '')} {p}"
                         for s, p in _SPARK_TO_PG.items())
        _psql(pg["conninfo"], f"CREATE TABLE typemap ({cols})")
        _psql(pg["conninfo"], """
            INSERT INTO typemap VALUES (
              true, 1, 2, 3, 4, 1.5, 2.5, 'txt', '\\xDEADBEEF',
              '2026-01-31', '2026-01-31 10:00:00+00',
              '2026-01-31 10:00:00')""")
        assert _psql(pg["conninfo"], "SELECT count(*) FROM typemap") == "1"


class TestSchemaDdl:
    def test_ensure_schema_sql_is_idempotent(self, pg):
        # the DDL text _ensure_schema_and_roles issues (compat.py:559)
        for _ in range(2):
            _psql(pg["conninfo"],
                  'CREATE SCHEMA IF NOT EXISTS "sg_dest"')
        assert _psql(
            pg["conninfo"],
            "SELECT count(*) FROM information_schema.schemata "
            "WHERE schema_name = 'sg_dest'") == "1"
