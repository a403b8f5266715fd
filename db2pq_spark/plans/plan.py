"""Export query planning: projection, rename, cast, filter, limit.

Capability parity with the reference's SELECT planner
(db2pq/postgres/column_filter.py:29-49 — regex keep/drop, drop first,
empty-selection error; db2pq/postgres/select_sql.py:68-155 — rename with
duplicate-output validation, col_types keyed on post-rename names with
unknown-key validation, WHERE/LIMIT passthrough).

The reference's IR is a SQL string; ours is a :class:`QueryPlan` that can
(a) **apply** to any DataFrame — the plan becomes a Catalyst logical plan
``select → cast → filter → limit`` that Spark optimizes (column pruning
and predicate pushdown reach the parquet/JDBC scan), and
(b) **compile** to a SELECT statement for server-side execution through
the JDBC ``query`` option, matching the reference's push-everything-to-
the-source semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from db2pq_spark.errors import (
    DuplicateOutputError,
    EmptySelectionError,
    UnknownColumnError,
)
from db2pq_spark.types import normalize_col_types, spark_type_for

Patterns = str | Iterable[str] | None


def _compile_patterns(patterns: Patterns) -> list[re.Pattern[str]]:
    if patterns is None:
        return []
    if isinstance(patterns, str):
        patterns = [patterns]
    return [re.compile(p) for p in patterns]


def filter_columns(
    columns: Sequence[str],
    keep: Patterns = None,
    drop: Patterns = None,
) -> list[str]:
    """Regex column selection: apply ``drop`` first, then ``keep``.

    Matches the reference's ordering and empty-result error
    (db2pq/postgres/column_filter.py:29-49). Patterns use ``re.search``
    semantics (substring match unless anchored), single pattern or
    iterable accepted.
    """
    out = list(columns)
    for pat in _compile_patterns(drop):
        out = [c for c in out if not pat.search(c)]
    keep_pats = _compile_patterns(keep)
    if keep_pats:
        out = [c for c in out if any(p.search(c) for p in keep_pats)]
    if not out:
        raise EmptySelectionError(
            "keep/drop filtering selected no columns "
            f"(keep={keep!r}, drop={drop!r})"
        )
    return out


def resolve_output_columns(
    columns: Sequence[str],
    rename: Mapping[str, str] | None,
) -> list[tuple[str, str]]:
    """Return ``(source, output)`` pairs after applying ``rename``.

    Unknown rename keys raise; duplicate output names raise — same
    contract as the reference (db2pq/postgres/select_sql.py:68-86).
    """
    rename = dict(rename or {})
    unknown = set(rename) - set(columns)
    if unknown:
        raise UnknownColumnError(
            f"rename references missing columns: {sorted(unknown)}"
        )
    pairs = [(c, rename.get(c, c)) for c in columns]
    seen: dict[str, str] = {}
    for src, out in pairs:
        if out in seen:
            raise DuplicateOutputError(
                f"duplicate output column {out!r} (from {seen[out]!r} and {src!r})"
            )
        seen[out] = src
    return pairs


def validate_col_types(
    col_types: Mapping[str, str] | None,
    output_columns: Sequence[str],
) -> dict[str, str]:
    """Normalize ``col_types`` and reject keys not in the output schema.

    Keys refer to **post-rename** names, as in the reference
    (db2pq/postgres/select_sql.py:89-105).
    """
    normalized = normalize_col_types(col_types)
    unknown = set(normalized) - set(output_columns)
    if unknown:
        raise UnknownColumnError(
            f"col_types references missing columns: {sorted(unknown)}"
        )
    return normalized


@dataclass(frozen=True)
class QueryPlan:
    """Frozen export plan (reference IR: db2pq/postgres/select_sql.py:7-18).

    ``columns`` are ``(source, output)`` pairs; ``col_types`` maps output
    name → canonical type; ``where`` is a SQL boolean expression passed
    through verbatim; ``obs`` is a row limit.
    """

    columns: tuple[tuple[str, str], ...]
    col_types: Mapping[str, str] = field(default_factory=dict)
    where: str | None = None
    obs: int | None = None

    @property
    def source_columns(self) -> list[str]:
        return [s for s, _ in self.columns]

    @property
    def output_columns(self) -> list[str]:
        return [o for _, o in self.columns]

    def apply(self, df: DataFrame) -> DataFrame:
        """Materialize the plan against a DataFrame.

        Filter runs **before** projection/rename (the reference's WHERE
        references source column names) and Catalyst pushes it into the
        scan; casts happen on the renamed output.
        """
        if self.where:
            df = df.filter(F.expr(self.where))
        cols = []
        for src, out in self.columns:
            c = F.col(src)
            if out in self.col_types:
                c = c.cast(spark_type_for(self.col_types[out]))
            cols.append(c.alias(out))
        df = df.select(*cols)
        if self.obs is not None:
            df = df.limit(int(self.obs))
        return df

    def to_sql(self, relation: str, dialect: str = "ansi") -> str:
        """Compile to a SELECT for server-side (JDBC ``query``) execution.

        Reproduces the reference's pushdown semantics
        (db2pq/postgres/select_sql.py:107-155): projection, ``AS`` rename,
        CAST per col_types, WHERE verbatim, LIMIT.
        """
        parts = []
        for src, out in self.columns:
            expr = _qident(src)
            if out in self.col_types:
                expr = f"CAST({expr} AS {_sql_type(self.col_types[out], dialect)})"
            parts.append(expr if src == out and out not in self.col_types
                         else f"{expr} AS {_qident(out)}")
        sql = f"SELECT {', '.join(parts)} FROM {relation}"
        if self.where:
            sql += f" WHERE {self.where}"
        if self.obs is not None:
            sql += f" LIMIT {int(self.obs)}"
        return sql


def _qident(name: str) -> str:
    """Quote an identifier (reference: psycopg sql.Identifier,
    db2pq/postgres/select_sql.py:20-24)."""
    return '"' + name.replace('"', '""') + '"'


_SQL_TYPES = {
    "boolean": "BOOLEAN",
    "int16": "SMALLINT",
    "int32": "INTEGER",
    "int64": "BIGINT",
    "float32": "REAL",
    "float64": "DOUBLE PRECISION",
    "string": "TEXT",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "binary": "BYTEA",
}


def _sql_type(canonical: str, dialect: str) -> str:
    if canonical in _SQL_TYPES:
        return _SQL_TYPES[canonical]
    if canonical.startswith("decimal("):
        return canonical.upper().replace("DECIMAL", "NUMERIC")
    return canonical.upper()


def build_plan(
    columns: Sequence[str],
    keep: Patterns = None,
    drop: Patterns = None,
    rename: Mapping[str, str] | None = None,
    col_types: Mapping[str, str] | None = None,
    where: str | None = None,
    obs: int | None = None,
) -> QueryPlan:
    """Plan an export: filter → rename → validate casts → freeze.

    Mirrors the reference's planning pipeline order
    (db2pq/postgres/select_sql.py:158-225): drop/keep regexes first,
    rename with duplicate detection, col_types validated against the
    post-rename schema.
    """
    selected = filter_columns(columns, keep=keep, drop=drop)
    pairs = resolve_output_columns(selected, rename)
    types_ = validate_col_types(col_types, [o for _, o in pairs])
    return QueryPlan(
        columns=tuple(pairs), col_types=types_, where=where, obs=obs
    )
