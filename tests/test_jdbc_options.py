"""JDBC option-builder unit tests (no database in this container — the
read path is vanilla spark.read.jdbc; what's ours is the planned-SQL
pushdown and the fetchsize heuristic, reference
db2pq/postgres/duckdb_pg.py:36-77)."""

from __future__ import annotations

import pytest

from db2pq_spark.plans.plan import build_plan
from db2pq_spark.sources.jdbc import (
    MAX_FETCH_ROWS,
    MIN_FETCH_ROWS,
    JdbcSource,
    estimate_fetch_size,
    jdbc_read_options,
)

SRC = JdbcSource(url="jdbc:postgresql://localhost:5432/db", user="u", password="p")


class TestFetchSize:
    def test_narrow_table_hits_max(self):
        # 4 float64 cols ≈ 32 B/row → 8 MiB / 32 ≫ 100k → clamp to max
        assert estimate_fetch_size(["date", "float64", "float64", "float64"]) \
            == MAX_FETCH_ROWS

    def test_wide_text_table_shrinks(self):
        # 40 text cols ≈ 2560 B/row → ~3276 rows → clamp to min
        assert estimate_fetch_size(["string"] * 40) == MIN_FETCH_ROWS

    def test_mid_width(self):
        # 64 string cols = 4096 B → 2048 rows → still clamped to min;
        # 16 strings = 1024 B → 8192 rows, inside the band
        assert estimate_fetch_size(["string"] * 16) == 8192

    def test_unknown_types_default(self):
        assert estimate_fetch_size([]) == MAX_FETCH_ROWS


class TestOptions:
    def test_plan_pushdown(self):
        plan = build_plan(["a", "b", "c"], keep=["^a$", "^b$"], where="a > 1")
        opts = jdbc_read_options(SRC, plan=plan, schema="s", table="t")
        assert opts["query"] == 'SELECT "a", "b" FROM "s"."t" WHERE a > 1'
        assert "dbtable" not in opts
        assert opts["user"] == "u" and opts["driver"] == "org.postgresql.Driver"

    def test_partitioned_read_wraps_query(self):
        plan = build_plan(["id", "v"])
        opts = jdbc_read_options(
            SRC, plan=plan, schema="s", table="t",
            partition_column="id", lower_bound=0, upper_bound=1000,
            num_partitions=16,
        )
        assert opts["dbtable"].startswith("(SELECT")
        assert opts["partitionColumn"] == "id"
        assert opts["numPartitions"] == "16"

    def test_requires_a_relation(self):
        with pytest.raises(ValueError):
            jdbc_read_options(SRC)

    def test_raw_sql(self):
        opts = jdbc_read_options(SRC, sql="SELECT 1 AS x")
        assert opts["query"] == "SELECT 1 AS x"
