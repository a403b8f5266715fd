"""Connection resolution + pgpass semantics (reference X5 parity:
db2pq/postgres/_defaults.py, db2pq/credentials.py)."""

from __future__ import annotations

import os

import pytest

from db2pq_spark.sources.credentials import (
    PgConnection,
    lookup_pgpass,
    resolve_pg_connection,
    save_password,
    wrds_connection,
)


@pytest.fixture(autouse=True)
def clean_env(monkeypatch):
    for k in ("PGHOST", "PGDATABASE", "PGUSER", "PGPORT", "PGPASSWORD",
              "PGPASSFILE", "WRDS_USER"):
        monkeypatch.delenv(k, raising=False)


class TestResolve:
    def test_explicit_wins_over_env(self, monkeypatch, tmp_path):
        monkeypatch.setenv("PGHOST", "envhost")
        c = resolve_pg_connection(host="argho", database="db", user="u",
                                  env_file=tmp_path / "nope")
        assert c.host == "argho"

    def test_env_wins_over_dotenv(self, monkeypatch, tmp_path):
        envf = tmp_path / ".env"
        envf.write_text("PGHOST=dotenvhost\nPGDATABASE=dotdb\nPGUSER=dotu\n")
        monkeypatch.setenv("PGHOST", "envhost")
        c = resolve_pg_connection(env_file=envf, pgpass=tmp_path / "nopass")
        assert (c.host, c.database, c.user) == ("envhost", "dotdb", "dotu")

    def test_missing_raises(self, tmp_path):
        with pytest.raises(ValueError, match="missing"):
            resolve_pg_connection(env_file=tmp_path / "nope",
                                  pgpass=tmp_path / "nopass")

    def test_jdbc_url(self):
        c = PgConnection("h", "d", "u", 9737)
        assert c.jdbc_url == "jdbc:postgresql://h:9737/d"

    def test_wrds_defaults(self, monkeypatch, tmp_path):
        monkeypatch.setenv("WRDS_USER", "alice")
        c = wrds_connection(pgpass=tmp_path / "nopass")
        assert c.host == "wrds-pgdata.wharton.upenn.edu"
        assert c.port == 9737 and c.database == "wrds" and c.user == "alice"


class TestPgpass:
    def conn(self):
        return PgConnection("db.example.com", "research", "alice", 5432)

    def test_lookup_with_wildcards(self, tmp_path):
        f = tmp_path / "pgpass"
        f.write_text("other:5432:*:bob:nope\n"
                     "*:*:research:alice:s3cret\n")
        os.chmod(f, 0o600)
        assert lookup_pgpass(self.conn(), f) == "s3cret"

    def test_insecure_file_ignored(self, tmp_path):
        f = tmp_path / "pgpass"
        f.write_text("*:*:*:*:leaky\n")
        os.chmod(f, 0o644)
        assert lookup_pgpass(self.conn(), f) is None

    def test_escaped_colons(self, tmp_path):
        f = tmp_path / "pgpass"
        f.write_text("db.example.com:5432:research:alice:pa\\:ss\\\\word\n")
        os.chmod(f, 0o600)
        assert lookup_pgpass(self.conn(), f) == "pa:ss\\word"

    def test_save_roundtrip_and_idempotence(self, tmp_path):
        f = tmp_path / "pgpass"
        save_password(self.conn(), "p:w", f)
        save_password(self.conn(), "p:w", f)  # no duplicate
        assert f.read_text().count("p\\:w") == 1
        assert oct(f.stat().st_mode & 0o777) == "0o600"
        assert lookup_pgpass(self.conn(), f) == "p:w"

    def test_resolution_uses_pgpass(self, tmp_path):
        f = tmp_path / "pgpass"
        f.write_text("h:5432:d:u:frompgpass\n")
        os.chmod(f, 0o600)
        c = resolve_pg_connection(host="h", database="d", user="u",
                                  env_file=tmp_path / "no", pgpass=f)
        assert c.password == "frompgpass"
