"""Binary-COPY writer framing (reference db2pq/postgres/copy.py parity):
COPY SQL shape, identifier quoting, type registration, row streaming —
driven through a fake Copy object (no PG in this container; the live
path is gated on psycopg + a reachable server, like the reference's
local_pg marker)."""

from __future__ import annotations

import pytest

from db2pq_spark.sinks.pg_copy import (
    copy_sql,
    jdbc_url_to_dsn,
    pg_type_for,
    quote_ident,
    stream_rows,
)


class FakeCopy:
    def __init__(self):
        self.types = None
        self.rows = []

    def set_types(self, types):
        self.types = list(types)

    def write_row(self, row):
        self.rows.append(tuple(row))


class TestFraming:
    def test_copy_sql_matches_reference_shape(self):
        sql = copy_sql("crsp", "dsf", ["permno", "date", "ret"])
        assert sql == ('COPY "crsp"."dsf" ("permno", "date", "ret") '
                       "FROM STDIN (FORMAT BINARY)")

    def test_identifiers_are_quoted_and_escaped(self):
        assert quote_ident('we"ird') == '"we""ird"'
        sql = copy_sql("s", 'ta"ble', ["c"])
        assert '"ta""ble"' in sql

    def test_stream_rows_registers_types_then_writes(self):
        fake = FakeCopy()
        n = stream_rows(fake, [(1, "a"), (2, "b")], ["int8", "text"])
        assert n == 2
        assert fake.types == ["int8", "text"]
        assert fake.rows == [(1, "a"), (2, "b")]

    def test_stream_rows_skips_set_types_when_all_inferred(self):
        fake = FakeCopy()
        stream_rows(fake, [(1,)], [None])
        assert fake.types is None

    def test_stream_rows_skips_set_types_when_any_unmapped(self):
        """psycopg's set_types rejects None entries — one unmapped
        column must disable registration wholesale, not crash."""
        fake = FakeCopy()
        stream_rows(fake, [(1, [2.0])], ["int8", None])
        assert fake.types is None

    def test_utcize_row_pins_naive_timestamps_to_utc(self):
        import datetime as dt

        from db2pq_spark.sinks.pg_copy import utcize_row

        naive = dt.datetime(2024, 6, 1, 12, 0, 0)
        out = utcize_row((1, naive, "x"), [1])
        assert out[0] == 1 and out[2] == "x"
        assert out[1].tzinfo is not None
        # same instant as interpreting the naive value as local time
        assert out[1] == naive.astimezone(dt.timezone.utc)
        # aware values and non-ts columns pass through untouched
        aware = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
        assert utcize_row((aware,), [0])[0] is aware
        assert utcize_row((5, "y"), []) == (5, "y")


class TestTypeMapping:
    @pytest.mark.parametrize("spark_t,pg_t", [
        ("bigint", "int8"), ("int", "int4"), ("smallint", "int2"),
        ("double", "float8"), ("float", "float4"), ("boolean", "bool"),
        ("string", "text"), ("binary", "bytea"), ("date", "date"),
        ("timestamp", "timestamptz"), ("timestamp_ntz", "timestamp"),
        ("decimal(18,4)", "numeric"), ("decimal(38,10)", "numeric"),
    ])
    def test_scalar_types(self, spark_t, pg_t):
        assert pg_type_for(spark_t) == pg_t

    def test_unknown_types_fall_back_to_inference(self):
        assert pg_type_for("array<double>") is None
        assert pg_type_for("map<string,string>") is None


class TestDsn:
    def test_url_with_port_db_and_params(self):
        dsn = jdbc_url_to_dsn(
            "jdbc:postgresql://wrds-pgdata.wharton.upenn.edu:9737/wrds"
            "?sslmode=require", user="u", password="p")
        assert "host=wrds-pgdata.wharton.upenn.edu" in dsn
        assert "port=9737" in dsn
        assert "dbname=wrds" in dsn
        assert "user=u" in dsn and "password=p" in dsn
        assert "sslmode=require" in dsn

    def test_minimal_url(self):
        assert jdbc_url_to_dsn("jdbc:postgresql://localhost/db") == \
            "host=localhost dbname=db"

    def test_non_postgres_url_rejected(self):
        with pytest.raises(ValueError, match="not a PostgreSQL"):
            jdbc_url_to_dsn("jdbc:mysql://h/db")

    def test_special_characters_are_conninfo_quoted(self):
        # a raw "password=x host=evil" would inject a conninfo param
        dsn = jdbc_url_to_dsn("jdbc:postgresql://h/db",
                              user="a user", password="x host=evil")
        assert "user='a user'" in dsn
        assert "password='x host=evil'" in dsn

    def test_quote_and_backslash_escaped(self):
        dsn = jdbc_url_to_dsn("jdbc:postgresql://h/db",
                              password="it's a\\trap")
        assert r"password='it\'s a\\trap'" in dsn

    def test_empty_password_quoted(self):
        assert "password=''" in jdbc_url_to_dsn(
            "jdbc:postgresql://h/db", password="")

    def test_jdbc_only_keys_translated_or_dropped(self):
        dsn = jdbc_url_to_dsn(
            "jdbc:postgresql://h/db?ssl=true&loginTimeout=10"
            "&reWriteBatchedInserts=true&ApplicationName=app")
        assert "sslmode=require" in dsn
        assert "connect_timeout=10" in dsn
        assert "application_name=app" in dsn
        # JDBC-driver-only knob libpq would reject: dropped
        assert "reWriteBatchedInserts" not in dsn
        assert "ssl=true" not in dsn


class TestDataFramePlumbing:
    def test_types_and_sql_derive_from_dataframe(self, spark, monkeypatch):
        """write_pg_copy wires (cols, dtypes) → (COPY sql, set_types
        list) and fans out via foreachPartition."""
        import db2pq_spark.sinks.pg_copy as mod
        from db2pq_spark.sources.jdbc import JdbcSource

        df = spark.createDataFrame(
            [(1, "a", 1.5)], "id bigint, name string, amt double")
        captured = {}

        def fake_copy_partition(rows, dsn, sql, types, ts_idx=None):
            captured["dsn"], captured["sql"] = dsn, sql
            captured["types"], captured["ts_idx"] = types, ts_idx
            captured.setdefault("rows", []).extend(tuple(r) for r in rows)

        monkeypatch.setattr(mod, "_copy_partition", fake_copy_partition)
        # run the per-partition closure driver-side (a real executor
        # would re-import the module and bypass the monkeypatch)
        local_rows = df.collect()
        monkeypatch.setattr(
            type(df), "foreachPartition",
            lambda self, f: f(iter(local_rows)), raising=True)
        src = JdbcSource("jdbc:postgresql://h:5432/d", user="u")
        mod.write_pg_copy(df.coalesce(1), src, "s", "t")
        assert captured["sql"] == \
            'COPY "s"."t" ("id", "name", "amt") FROM STDIN (FORMAT BINARY)'
        assert captured["types"] == ["int8", "text", "float8"]
        assert captured["ts_idx"] == []
        assert captured["dsn"] == "host=h port=5432 dbname=d user=u"
        assert captured["rows"] == [(1, "a", 1.5)]
