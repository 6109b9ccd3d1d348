"""Declarative data-quality expectations over any DataFrame — the
dbt-test / Great-Expectations shape as a Spark-first operator.

A check list compiles to ONE aggregation pass over the table (every
row-level check is a boolean column summed map-side) plus one small
anti-join per foreign-key check — so a 100 TB table pays a single scan
for all row-level expectations, not one job per check.  Output is the
audit frame a pipeline writes next to a published snapshot:
(check, n_violations) with a row per declared expectation.

Checks (all pure expressions, engine-neutral semantics):
- not_null(col)
- unique(cols...)          — duplicate ROWS beyond the first per key
- accepted_values(col, values)
- in_range(col, lo, hi)    — inclusive bounds; NULL does not violate
  (pair with not_null to forbid NULLs)
- foreign_key(col, parent_df, parent_col) — orphan child rows
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str


@dataclass(frozen=True)
class NotNull(Check):
    col: str = ""


def not_null(col: str) -> NotNull:
    return NotNull(name=f"not_null({col})", col=col)


@dataclass(frozen=True)
class AcceptedValues(Check):
    col: str = ""
    values: tuple = ()


def accepted_values(col: str, values) -> AcceptedValues:
    return AcceptedValues(name=f"accepted_values({col})", col=col,
                          values=tuple(values))


@dataclass(frozen=True)
class InRange(Check):
    col: str = ""
    lo: float = 0.0
    hi: float = 0.0


def in_range(col: str, lo, hi) -> InRange:
    return InRange(name=f"in_range({col})", col=col, lo=lo, hi=hi)


@dataclass(frozen=True)
class Unique(Check):
    cols: tuple = ()


def unique(*cols: str) -> Unique:
    return Unique(name=f"unique({','.join(cols)})", cols=tuple(cols))


@dataclass(frozen=True)
class ForeignKey(Check):
    col: str = ""
    parent: DataFrame = field(default=None, compare=False, hash=False)
    parent_col: str = ""


def foreign_key(col: str, parent: DataFrame, parent_col: str) -> ForeignKey:
    return ForeignKey(name=f"foreign_key({col}->{parent_col})", col=col,
                      parent=parent, parent_col=parent_col)


def _violation_expr(c: Check) -> Column:
    if isinstance(c, ExprCheck):
        return c.expr
    if isinstance(c, NotNull):
        return F.col(c.col).isNull()
    if isinstance(c, AcceptedValues):
        return (F.col(c.col).isNull()
                | ~F.col(c.col).isin(*[F.lit(v) for v in c.values]))
    if isinstance(c, InRange):
        return (F.col(c.col) < F.lit(c.lo)) | (F.col(c.col) > F.lit(c.hi))
    raise TypeError(f"not a row-level check: {c}")


def run_expectations(df: DataFrame, checks) -> DataFrame:
    """Evaluate every check; returns (check, n_violations), one row per
    check, in DECLARATION order (an `ord` column a caller may drop).

    Row-level checks (not_null / accepted_values / in_range) fold into a
    single aggregation over one table scan.  unique() is one groupBy on
    its key counting rows beyond the first per duplicate key.
    foreign_key() is one left-anti join per declared FK.  All counts are
    BIGINT."""
    checks = list(checks)
    recognized = [c for c in checks
                  if isinstance(c, (NotNull, AcceptedValues, InRange,
                                    ExprCheck, Unique, ForeignKey))]
    if not recognized:
        raise ValueError(
            "run_expectations needs at least one recognized Check "
            f"(got {[type(c).__name__ for c in checks] or 'an empty list'})")
    if len(recognized) != len(checks):
        bad = [type(c).__name__ for c in checks if c not in recognized]
        raise ValueError(f"unsupported check types: {bad}")
    row_checks = [c for c in checks
                  if isinstance(c, (NotNull, AcceptedValues, InRange,
                                    ExprCheck))]
    parts = []
    if row_checks:
        # coalesce: F.sum over ZERO rows is NULL, not 0 — an empty table
        # has no violations (callers int() these counts; ADVICE r9)
        aggs = [F.coalesce(
                    F.sum(F.when(_violation_expr(c), 1).otherwise(0)),
                    F.lit(0))
                .cast("bigint").alias(f"v{i}")
                for i, c in enumerate(row_checks)]
        row = df.agg(*aggs)
        # unpivot the 1-row agg via explode — a union-of-selects here would
        # re-evaluate the agg (and re-SCAN the table) once per check:
        # Spark shares no common subplans across union branches (NOTES.md)
        kvs = F.array(*[
            F.struct(F.lit(c.name).alias("check"),
                     F.col(f"v{i}").alias("n_violations"))
            for i, c in enumerate(row_checks)])
        parts.append(row.select(F.explode(kvs).alias("kv"))
                     .select("kv.check", "kv.n_violations"))
    for c in checks:
        if isinstance(c, Unique):
            dup = (df.groupBy(*c.cols).agg(F.count("*").alias("n"))
                   .agg(F.coalesce(
                        F.sum(F.when(F.col("n") > 1, F.col("n") - 1)),
                        F.lit(0)).cast("bigint").alias("n_violations"))
                   .select(F.lit(c.name).alias("check"), "n_violations"))
            parts.append(dup)
        elif isinstance(c, ForeignKey):
            orphans = (df.select(F.col(c.col).alias("k"))
                       .join(c.parent.select(
                           F.col(c.parent_col).alias("k")),
                           "k", "left_anti")
                       .agg(F.lit(c.name).alias("check"),
                            F.count("*").alias("n_violations")))
            parts.append(orphans)
    out = None
    for p in parts:
        out = p if out is None else out.unionByName(p)
    order = {c.name: i for i, c in enumerate(checks)}
    m = F.create_map(*[x for k, v in order.items()
                       for x in (F.lit(k), F.lit(v))])
    return out.withColumn("ord", m[F.col("check")].cast("int"))


@dataclass(frozen=True)
class ExprCheck(Check):
    expr: Column = field(default=None, compare=False, hash=False)


def expr_check(name: str, violation: Column) -> ExprCheck:
    """Arbitrary row-level expectation: `violation` is a boolean Column
    that is true for violating rows.  Folds into the same single-scan
    aggregation as the built-in row checks."""
    return ExprCheck(name=name, expr=violation)
