"""Reference-shaped module-level API (compat facade).

Checks the drop-in surface: every name the reference exports resolves
(db2pq/__init__.py:7-16), parquet-repository functions operate on a real
local repository, and the JDBC-backed export path builds the same
planned read the Engine does (database calls stubbed — no DB ships in
this container).
"""

from __future__ import annotations

import pytest

import db2pq_spark
from db2pq_spark import compat

REFERENCE_EXPORTS = [
    "db_to_pq", "pg_update_pq", "db_to_pg", "ibis_to_pq", "wrds_pg_to_pq",
    "wrds_sql_to_pq", "wrds_pg_to_pg", "db_schema_to_pq", "wrds_update_pq",
    "pq_list_files", "wrds_update_schema", "pq_last_modified", "pq_archive",
    "pq_restore", "pq_remove", "db_schema_tables", "wrds_get_tables",
    "wrds_update_pg", "pq_to_pg", "pq_update_pg", "process_sql",
    "set_table_comment", "close_adbc_cached", "set_default_engine",
    "get_default_engine",
]


class TestSurface:
    def test_every_reference_export_resolves(self):
        for name in REFERENCE_EXPORTS:
            assert callable(getattr(db2pq_spark, name)), name

    def test_unknown_attribute_raises(self):
        with pytest.raises(AttributeError):
            db2pq_spark.not_a_function

    def test_engine_config_shims(self):
        compat.set_default_engine("adbc")  # accepted for compatibility
        assert compat.get_default_engine() == "adbc"
        compat.set_default_engine("spark")
        with pytest.raises(ValueError):
            compat.set_default_engine("")
        compat.close_adbc_cached()  # no-op, must not raise

    def test_data_dir_resolution(self, monkeypatch, tmp_path):
        monkeypatch.delenv("DATA_DIR", raising=False)
        assert compat.resolve_data_dir("/x/y") == __import__("pathlib").Path("/x/y")
        monkeypatch.setenv("DATA_DIR", str(tmp_path))
        assert compat.resolve_data_dir() == tmp_path


@pytest.fixture()
def repo(spark, tmp_path, sf_dir):
    """A tiny real repository: documents exported into tmp_path."""
    eng = compat._engine(tmp_path)
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    eng.df_to_pq(df, "tpch", "nation",
                 last_modified="Last modified: 01/02/2026 10:00:00")
    return tmp_path


class TestRepositoryFunctions:
    def test_list_archive_restore_remove_cycle(self, repo):
        assert compat.pq_list_files("tpch", data_dir=repo) == ["nation"]

        archived = compat.pq_archive("nation", "tpch", data_dir=repo)
        assert archived is not None
        assert compat.pq_list_files("tpch", data_dir=repo) == []
        stems = compat.pq_list_files("tpch", data_dir=repo, archive=True)
        assert len(stems) == 1 and stems[0].startswith("nation_")

        compat.pq_restore(stems[0], "tpch", data_dir=repo, archive=False)
        assert compat.pq_list_files("tpch", data_dir=repo) == ["nation"]

        assert compat.pq_remove("nation", "tpch", data_dir=repo) is True
        assert compat.pq_list_files("tpch", data_dir=repo) == []

    def test_last_modified_summary(self, repo):
        rows = compat.pq_last_modified("tpch", data_dir=repo)
        assert rows and rows[0]["table"] == "nation"
        assert "01/02/2026" in rows[0]["last_modified"]

    def test_data_dir_env_fallback(self, repo, monkeypatch):
        monkeypatch.setenv("DATA_DIR", str(repo))
        assert compat.pq_list_files("tpch") == ["nation"]

    def test_custom_archive_dir_rejected(self, repo):
        with pytest.raises(NotImplementedError):
            compat.pq_list_files("tpch", data_dir=repo, archive_dir="old")


class TestIbisToPq:
    def test_dataframe_is_the_expression(self, spark, tmp_path, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
        out = tmp_path / "tpch" / "region.parquet"
        path = db2pq_spark.ibis_to_pq(df, out)
        assert path is not None
        assert compat.pq_list_files("tpch", data_dir=tmp_path) == ["region"]

    def test_non_dataframe_rejected(self):
        with pytest.raises(TypeError):
            db2pq_spark.ibis_to_pq(object(), "/tmp/x/y.parquet")

    def test_genuine_ibis_expression_compiles_to_source_sql(
            self, spark, tmp_path, sf_dir, monkeypatch):
        """A (faked) Ibis expression is compiled with ibis.to_sql and
        executed on the source database via the JDBC query path —
        reference db2pq/ibis.py compile-and-stream shape."""
        import sys
        import types as pytypes

        import db2pq_spark.sources.jdbc as jdbc_mod
        from db2pq_spark.sources.jdbc import JdbcSource

        fake_ibis = pytypes.ModuleType("ibis")
        fake_ibis.to_sql = lambda expr: "SELECT r_regionkey, r_name FROM region"
        monkeypatch.setitem(sys.modules, "ibis", fake_ibis)

        captured = {}

        def fake_read_jdbc(spark_, options):
            captured.update(options)
            return spark.read.parquet(f"{sf_dir}/region.parquet") \
                .select("r_regionkey", "r_name")

        monkeypatch.setattr(jdbc_mod, "read_jdbc", fake_read_jdbc)
        # core.sql_to_pq imports read_jdbc locally from the module —
        # patching the module attribute covers it

        out = tmp_path / "tpch" / "region_expr.parquet"
        src = JdbcSource("jdbc:postgresql://h:5432/d", user="u")
        path = db2pq_spark.ibis_to_pq(object(), out, source=src)
        assert path is not None
        assert "region" in captured.get("query", "")
        assert captured["url"].startswith("jdbc:postgresql://h:5432/d")

    def test_ibis_expression_without_backend_or_source_rejected(
            self, monkeypatch, tmp_path):
        import sys
        import types as pytypes

        fake_ibis = pytypes.ModuleType("ibis")
        fake_ibis.to_sql = lambda expr: "SELECT 1"
        monkeypatch.setitem(sys.modules, "ibis", fake_ibis)
        with pytest.raises(ValueError, match="source=JdbcSource"):
            db2pq_spark.ibis_to_pq(object(), tmp_path / "s" / "t.parquet")


class TestJdbcBackedExports:
    """DB-less: stub read_jdbc to serve a local table and capture the
    generated options — the planned SELECT must push down server-side."""

    @pytest.fixture()
    def captured(self, spark, sf_dir, monkeypatch, tmp_path):
        from db2pq_spark.sources import jdbc as jdbc_mod

        calls: list[dict[str, str]] = []
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

        def fake_read(spark_, options):
            calls.append(options)
            q = options.get("query", "")
            return nation.limit(0) if "LIMIT 0" in q else nation

        monkeypatch.setattr(jdbc_mod, "read_jdbc", fake_read)
        monkeypatch.setenv("PGHOST", "db.example.com")
        monkeypatch.setenv("PGDATABASE", "testdb")
        monkeypatch.setenv("PGUSER", "tester")
        return calls

    def test_db_to_pq_plans_server_side(self, captured, tmp_path):
        path = db2pq_spark.db_to_pq(
            "nation", "tpch", data_dir=tmp_path,
            keep=["^n_nationkey$", "^n_name$"],
            where="n_nationkey < 10",
            modified="Last modified: 01/02/2026 10:00:00",
        )
        assert path is not None
        # probe (LIMIT 0) + planned read, both against the right URL
        assert all("db.example.com" in c["url"] for c in captured)
        planned = captured[-1]["query"]
        assert '"n_nationkey"' in planned and "WHERE" in planned
        assert "n_regionkey" not in planned  # projection pushed down
        assert compat.pq_list_files("tpch", data_dir=tmp_path) == ["nation"]

    def test_alt_table_name_renames_output(self, captured, tmp_path):
        db2pq_spark.db_to_pq(
            "nation", "tpch", data_dir=tmp_path, alt_table_name="nations_v2",
            modified="Last modified: 01/02/2026 10:00:00",
        )
        assert compat.pq_list_files("tpch", data_dir=tmp_path) == ["nations_v2"]

    def test_pg_update_pq_skips_when_fresh(self, captured, tmp_path, capsys):
        kw = dict(data_dir=tmp_path,
                  modified="Last modified: 01/02/2026 10:00:00")
        assert db2pq_spark.pg_update_pq("nation", "tpch", **kw) is not None
        # second run: same stamp → date-granularity comparison skips
        assert db2pq_spark.pg_update_pq("nation", "tpch", **kw) is None
        assert "Skipped" in capsys.readouterr().out

    def test_db_schema_tables_queries_information_schema(self, captured):
        tables = db2pq_spark.db_schema_tables("tpch")
        assert captured[-1]["query"].startswith("SELECT table_name")
        assert "'tpch'" in captured[-1]["query"]
        assert isinstance(tables, list)


class TestWrdsResolution:
    def test_wrds_requires_user(self, monkeypatch):
        for var in ("WRDS_ID", "WRDS_USER", "PGUSER"):
            monkeypatch.delenv(var, raising=False)
        with pytest.raises(ValueError):
            db2pq_spark.wrds_get_tables("crsp")

    def test_wrds_url_shape(self, monkeypatch):
        monkeypatch.setenv("WRDS_ID", "someuser")
        src = compat._wrds_source()
        assert "wrds-pgdata.wharton.upenn.edu:9737" in src.url
        assert "sslmode=require" in src.url


class TestWrdsSsl:
    def test_pg_source_adds_sslmode_for_wrds_host(self, monkeypatch):
        monkeypatch.setenv("PGUSER", "someuser")
        src = compat._pg_source(host="wrds-pgdata.wharton.upenn.edu",
                                database="wrds", port=9737)
        assert src.url.endswith("?sslmode=require")
        plain = compat._pg_source(host="db.example.com", database="x")
        assert "sslmode" not in plain.url
