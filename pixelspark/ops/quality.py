"""Declarative data-quality constraints (the dbt-test / Delta
CHECK-constraint surface): validate a DataFrame against named rules
and get back per-rule violation counts plus sample offending keys.

All rules compile to ONE aggregation pass (conditional count_if per
rule) — at 100 TB you cannot afford a scan per rule; the whole rule
set rides a single scan with every predicate fused into one projected
stage.  Uniqueness rules need their own groupBy (a shuffle is
inherent to global uniqueness), still one per key set, not per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null_{col}", F.col(col).isNotNull())


def in_set(col: str, allowed: list) -> tuple[str, Column]:
    return (f"in_set_{col}", F.col(col).isin(allowed))


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (f"in_range_{col}", F.col(col).between(lo, hi))


def satisfies(name: str, predicate: Column) -> tuple[str, Column]:
    return (name, predicate)


def check_constraints(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """One-pass row-rule audit: returns (rule, n_rows, n_violations,
    violation_rate) per rule — count_if over the negated predicate,
    all rules in a single aggregate."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")] + [
        F.count_if(~F.coalesce(pred, F.lit(False))).alias(name) for name, pred in rules
    ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").alias("n_rows"),
                        F.col(name).alias("n_violations"),
                    )
                    for name, _ in rules
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        "r.rule",
        "r.n_rows",
        "r.n_violations",
        F.round(F.col("r.n_violations") / F.col("r.n_rows"), 6).alias("violation_rate"),
    )


def check_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness audit for a key set: returns the duplicated keys and
    their multiplicities (empty result = constraint holds)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .orderBy(F.col("n").desc(), *keys)
    )
