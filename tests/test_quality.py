"""Data-quality constraint pack: one-pass rule audit + uniqueness."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixelspark.ops import quality as DQ
from pixelspark.schemas import load_table


def test_check_constraints_counts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    out = {
        r["rule"]: r
        for r in DQ.check_constraints(
            e,
            [
                DQ.not_null("user_id"),
                DQ.in_range("value", 0, 0.5),  # deliberately tight: must flag rows
            ],
        ).collect()
    }
    n = e.count()
    assert out["not_null_user_id"]["n_rows"] == n
    assert out["not_null_user_id"]["n_violations"] == 0
    want = e.where(~F.col("value").between(0, 0.5) | F.col("value").isNull()).count()
    assert out["in_range_value"]["n_violations"] == want > 0


def test_check_constraints_single_scan(spark, sf_dir):
    import re

    e = load_table(spark, sf_dir, "events")
    df = DQ.check_constraints(e, [DQ.not_null("user_id"), DQ.in_range("value", 0, 1)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet", plan)) == 1  # all rules share one pass


def test_check_unique(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert DQ.check_unique(e, ["event_id"]).count() == 0  # PK holds
    dupes = DQ.check_unique(e.unionByName(e.limit(5)), ["event_id"])
    assert dupes.count() == 5
    assert all(r["n"] == 2 for r in dupes.collect())
