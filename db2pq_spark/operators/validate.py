"""Data-quality validation: declarative constraint checks in one pass.

[extension — not in the reference, which trusts its sources' schemas;
the same niche as dbt tests / AWS Deequ] A validation suite compiles
to the minimum number of Spark jobs:

- **row-level rules** (not-null, range, accepted values, regex,
  arbitrary boolean SQL) all become ``SUM(CASE WHEN violated ...)``
  columns of ONE aggregation over ONE scan of the table — adding a
  rule adds zero I/O. Partial (map-side) aggregation means the
  shuffle is a few longs per partition regardless of table size.
- **uniqueness** runs in the same pass as a distinct-count aggregate
  (``count(*) - count(DISTINCT struct(keys))`` = number of surplus
  duplicate rows).
- **referential integrity** (foreign keys) needs the dimension table,
  so each FK check is its own left-anti join — broadcast when the
  dimension is small, shuffle hash otherwise; AQE decides.

The result is a tiny DataFrame ``(rule, violations, n_rows, passed)``
— one row per rule — suitable for gating a pipeline
(``.filter("NOT passed")``) or appending to an audit table.

NULL semantics follow SQL three-valued logic: a NULL comparison is not
a violation unless the rule is explicitly ``not_null`` (so ``in_range``
on a NULL value passes — add ``not_null`` separately to forbid NULLs).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Rule(NamedTuple):
    """A named row-level constraint; ``violated`` is a boolean Column
    that is true where the row breaks the rule."""
    name: str
    violated: Column


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    c = F.col(col)
    return Rule(name or f"in_range({col},{lo},{hi})", (c < lo) | (c > hi))


def accepted_values(col: str, values: Sequence, name: str | None = None) -> Rule:
    return Rule(name or f"accepted_values({col})",
                ~F.col(col).isin(list(values)))


def matches(col: str, regex: str, name: str | None = None) -> Rule:
    return Rule(name or f"matches({col})", ~F.col(col).rlike(regex))


def expr_check(name: str, violated_sql: str) -> Rule:
    """Arbitrary SQL predicate naming the *violation* condition."""
    return Rule(name, F.expr(violated_sql))


class UniqueKey(NamedTuple):
    name: str
    cols: tuple[str, ...]


def unique_key(*cols: str, name: str | None = None) -> UniqueKey:
    return UniqueKey(name or f"unique({','.join(cols)})", tuple(cols))


class ForeignKey(NamedTuple):
    name: str
    col: str
    ref: DataFrame
    ref_col: str


def foreign_key(col: str, ref: DataFrame, ref_col: str,
                name: str | None = None) -> ForeignKey:
    return ForeignKey(name or f"fk({col})", col, ref, ref_col)


def validate(
    df: DataFrame,
    rules: Sequence[Rule | UniqueKey | ForeignKey],
) -> DataFrame:
    """Run a validation suite; returns
    ``(rule string, violations bigint, n_rows bigint, passed boolean)``
    with one row per rule, in the order given.

    Row rules and unique keys share a single scan+aggregate job; each
    foreign key adds one anti-join job. Nothing collects to the driver.
    """
    row_rules = [r for r in rules if isinstance(r, Rule)]
    uniques = [r for r in rules if isinstance(r, UniqueKey)]
    fks = [r for r in rules if isinstance(r, ForeignKey)]
    if not (row_rules or uniques or fks):
        raise ValueError("empty rule list")

    parts: list[DataFrame] = []
    if row_rules or uniques:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for r in row_rules:
            aggs.append(F.sum(F.when(r.violated, 1).otherwise(0))
                        .cast("bigint").alias(r.name))
        for u in uniques:
            surplus = (F.count(F.lit(1)) -
                       F.count_distinct(F.struct(*[F.col(c) for c in u.cols])))
            aggs.append(surplus.cast("bigint").alias(u.name))
        one = df.agg(*aggs)
        names = [r.name for r in row_rules] + [u.name for u in uniques]
        melted = one.select(
            F.explode(F.array(*[
                F.struct(F.lit(n).alias("rule"),
                         F.coalesce(F.col(f"`{n}`"), F.lit(0)).alias("violations"),
                         F.col("__n").alias("n_rows"))
                for n in names
            ])).alias("r")
        ).select("r.rule", "r.violations", "r.n_rows")
        parts.append(melted)

    for fk in fks:
        # pre-aggregate the probe side to (key, row count) BEFORE the
        # anti join: the map-side combine collapses the fact relation
        # to its distinct keys (lineitem carries ~4 rows per orderkey),
        # so the join shuffles and sorts key-cardinality rows instead
        # of fact-cardinality rows — the violation count is the SUM of
        # the orphan keys' row counts, identical by definition.
        # NULL keys are not orphans (use not_null to forbid).
        probe = (df.select(F.col(fk.col))
                 .filter(F.col(fk.col).isNotNull())
                 .groupBy(fk.col).agg(F.count(F.lit(1)).alias("__c")))
        orphans = probe.join(
            fk.ref.select(F.col(fk.ref_col).alias(fk.col)).distinct(),
            on=fk.col, how="left_anti")
        parts.append(
            df.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(orphans.agg(
                F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint")
                .alias("violations")))
            .select(F.lit(fk.name).alias("rule"), "violations",
                    "n_rows"))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)
