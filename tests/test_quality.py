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


def test_repetition_signals_hand_computed(spark):
    """'a b a b a b' -> bigrams [a b, b a, a b, b a, a b]: total 5,
    top 'a b' 3x -> top2 3/5, dup = (5-2)/5; a looping template must
    fail the published 2-gram threshold while varied text passes."""
    from pixelspark.ops.llm import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "x"),          # shorter than any n: NULL signals, passes
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs, ns=(2, 3)).collect()}
    assert got[1]["n_2grams"] == 5
    assert abs(got[1]["top2_frac"] - 0.6) < 1e-9
    assert abs(got[1]["dup2_frac"] - 0.6) < 1e-9
    # trigrams of doc1: [aba, bab, aba, bab] -> top 2/4
    assert got[1]["n_3grams"] == 4
    assert abs(got[1]["top3_frac"] - 0.5) < 1e-9
    assert got[1]["passes_repetition"] is False
    assert got[2]["top2_frac"] is not None and got[2]["passes_repetition"] is True
    assert got[3]["n_2grams"] is None and got[3]["passes_repetition"] is True
    assert got[4]["n_2grams"] is None and got[4]["passes_repetition"] is True
