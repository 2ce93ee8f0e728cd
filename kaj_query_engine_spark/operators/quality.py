"""Declarative data-quality constraint auditing (expectations).

The reference engine validates nothing about its inputs (ConvertTxtToTbl
ingests blindly — ``/root/reference/src/ConvertTxtToTbl.java``); a
100 TB ingest needs the opposite: every landing batch audited against
declared expectations BEFORE it merges into the corpus, with a
machine-readable violation report (the Deequ/Great-Expectations shape,
reduced to the five constraint families a pipeline actually gates on).

Each constraint compiles to a declarative aggregation over ONE scan —
the audit of N constraints on a table is ONE pass (all counters in a
single ``agg``), except referential checks, which each add one
broadcast-able anti-join probe. Nothing collects to the driver but the
per-constraint violation counts (fixed-size by construction).

Report schema (one row per constraint):
    constraint  STRING  -- e.g. 'not_null(o_custkey)'
    violations  BIGINT  -- rows failing the expectation
    checked     BIGINT  -- rows the expectation applied to
    passed      BOOLEAN -- violations == 0
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    # aggregate producing the violation count over the scanned table
    violation_agg: Column
    checked_agg: Column


def not_null(col: str) -> Constraint:
    return Constraint(
        f"not_null({col})",
        F.count_if(F.col(col).isNull()),
        F.count(F.lit(1)),
    )


def in_range(col: str, lo, hi) -> Constraint:
    """NULLs don't violate a range rule (that's not_null's job) and
    aren't counted as checked."""
    c = F.col(col)
    return Constraint(
        f"in_range({col},{lo},{hi})",
        F.count_if(c.isNotNull() & ~c.between(lo, hi)),
        F.count(col),
    )


def accepted_values(col: str, values: list) -> Constraint:
    c = F.col(col)
    vals = ",".join(str(v) for v in values)
    return Constraint(
        f"accepted_values({col},[{vals}])",
        F.count_if(c.isNotNull() & ~c.isin(values)),
        F.count(col),
    )


def matches(col: str, pattern: str) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"matches({col},{pattern})",
        F.count_if(c.isNotNull() & ~c.rlike(pattern)),
        F.count(col),
    )


def unique(col: str) -> Constraint:
    """Violations = rows beyond the first of each duplicated value —
    computed as count - distinct-count, one pass, no self-join. NULL
    keys are ignored (SQL UNIQUE semantics).

    Scale note: ONE unique() per audit() call keeps the plan
    Expand-free (a single distinct aggregate rewrites to two-phase
    hash aggregation; the q45 lesson is that N>1 distinct columns in
    one agg trigger an N-way Expand of the scan). Audit N key columns
    with N audit() calls — unions are cheap, Expand is not."""
    return Constraint(
        f"unique({col})",
        F.count(col) - F.count_distinct(F.col(col)),
        F.count(col),
    )


def audit(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """All single-table constraints in ONE aggregation pass (one scan,
    one 1-row partial-aggregated reduce), unpivoted to the report
    schema via stack() — constraint count never adds scans."""
    aggs = []
    for i, c in enumerate(constraints):
        aggs.append(c.violation_agg.alias(f"_v{i}"))
        aggs.append(c.checked_agg.alias(f"_c{i}"))
    row = df.agg(*aggs)
    # names are embedded in SQL text: escape quotes so a constraint
    # like accepted_values(name,[O'Brien]) can't break the parse
    cells = ", ".join(
        "'{}', _v{}, _c{}".format(c.name.replace("'", "''"), i, i)
        for i, c in enumerate(constraints)
    )
    return row.select(
        F.expr(
            f"stack({len(constraints)}, {cells}) "
            "AS (constraint, violations, checked)"
        )
    ).select(
        "constraint",
        "violations",
        "checked",
        (F.col("violations") == 0).alias("passed"),
    )


def referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Foreign-key audit: child values with no parent row. ONE left
    join against the distinct parent keys with a hit marker, then one
    aggregation counts checked and orphaned together — single pass,
    no second scan of the child, no 1-row cross-join recombination
    (an earlier anti-join + crossJoin shape planned a nested-loop
    join the q58 gate forbids). The parent key set broadcasts when
    bounded; at scale both sides bucket on the key. NULL children are
    not violations (SQL FK semantics)."""
    marked = child.select(F.col(child_col)).join(
        parent.select(F.col(parent_col).alias(child_col))
        .distinct()
        .withColumn("_hit", F.lit(1)),
        on=child_col,
        how="left",
    )
    return marked.agg(
        F.count_if(
            F.col(child_col).isNotNull() & F.col("_hit").isNull()
        ).alias("violations"),
        F.count(child_col).alias("checked"),
    ).select(
        F.lit(f"referential({child_col}->{parent_col})").alias("constraint"),
        "violations",
        "checked",
        (F.col("violations") == 0).alias("passed"),
    )
