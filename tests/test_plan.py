"""Unit tests for planning logic — no Spark session needed.

Mirrors the reference's pure planning tests (tests/test_select_sql.py,
tests/test_defaults.py in /root/reference)."""

from __future__ import annotations

import pytest

from db2pq_spark.errors import (
    DuplicateOutputError,
    EmptySelectionError,
    UnknownColumnError,
    UnknownTypeError,
)
from db2pq_spark.plans.plan import (
    QueryPlan,
    build_plan,
    filter_columns,
    resolve_output_columns,
    validate_col_types,
)
from db2pq_spark.types import canonical_type, normalize_col_types, spark_type_for

COLS = ["gvkey", "conm", "addr1", "city", "sic", "fyear"]


class TestFilterColumns:
    def test_no_patterns_keeps_all(self):
        assert filter_columns(COLS) == COLS

    def test_drop_applied_first(self):
        # drop removes 'addr1'; keep would otherwise have matched it
        assert filter_columns(COLS, keep="a", drop="addr") == ["fyear"]

    def test_keep_single_and_iterable(self):
        assert filter_columns(COLS, keep="^gvkey$") == ["gvkey"]
        assert filter_columns(COLS, keep=["^gvkey$", "^conm$"]) == ["gvkey", "conm"]

    def test_empty_selection_raises(self):
        with pytest.raises(EmptySelectionError):
            filter_columns(COLS, keep="nomatch")

    def test_search_semantics(self):
        # unanchored pattern matches substrings, like the reference
        assert filter_columns(COLS, keep="c") == ["conm", "city", "sic"]


class TestRename:
    def test_basic(self):
        pairs = resolve_output_columns(["a", "b"], {"a": "x"})
        assert pairs == [("a", "x"), ("b", "b")]

    def test_unknown_key_raises(self):
        with pytest.raises(UnknownColumnError):
            resolve_output_columns(["a"], {"zz": "x"})

    def test_duplicate_output_raises(self):
        with pytest.raises(DuplicateOutputError):
            resolve_output_columns(["a", "b"], {"a": "b"})


class TestColTypes:
    def test_post_rename_keys(self):
        # col_types keys refer to output (post-rename) names
        with pytest.raises(UnknownColumnError):
            validate_col_types({"a": "int32"}, ["x", "b"])
        assert validate_col_types({"x": "int32"}, ["x", "b"]) == {"x": "int32"}

    def test_unknown_type(self):
        with pytest.raises(UnknownTypeError):
            validate_col_types({"x": "wibble"}, ["x"])


class TestTypes:
    def test_aliases(self):
        assert canonical_type("INTEGER") == "int32"
        assert canonical_type("double precision") == "float64"
        assert canonical_type("bytea") == "binary"
        assert canonical_type("numeric(12,4)") == "decimal(12,4)"

    def test_spark_types(self):
        from pyspark.sql import types as T

        assert spark_type_for("int32") == T.IntegerType()
        assert spark_type_for("decimal(12,4)") == T.DecimalType(12, 4)
        # decimal256-class precision degrades to string (documented deviation)
        assert spark_type_for("decimal(76,10)") == T.StringType()

    def test_normalize_col_types_names_column_in_error(self):
        with pytest.raises(UnknownTypeError, match="lpermno"):
            normalize_col_types({"lpermno": "nope"})


class TestPlanSQL:
    def test_full_plan_sql(self):
        plan = build_plan(
            COLS,
            keep=["^gvkey$", "^conm$", "^fyear$"],
            rename={"conm": "company_name"},
            col_types={"fyear": "int32"},
            where="fyear > 2000",
            obs=100,
        )
        sql = plan.to_sql('"comp"."company"')
        assert sql == (
            'SELECT "gvkey", "conm" AS "company_name", '
            'CAST("fyear" AS INTEGER) AS "fyear" '
            'FROM "comp"."company" WHERE fyear > 2000 LIMIT 100'
        )

    def test_plan_is_frozen(self):
        plan = build_plan(["a"])
        with pytest.raises(Exception):
            plan.where = "x"  # type: ignore[misc]
