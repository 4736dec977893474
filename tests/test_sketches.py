"""Mergeable-summary pack (ops/sketches.py): bitmap distinct counts
are exact and idempotent under partial overlap; approx_top_k finds the
true heavy hitters in the k < cardinality regime."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixelspark.ops import sketches as SK
from pixelspark.schemas import load_table


def test_bitmap_distinct_matches_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    got = {
        r["event_type"]: r["distinct_count"]
        for r in SK.bitmap_distinct(ev, ["event_type"], "user_id").collect()
    }
    want = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert got == want


def test_bitmap_merge_idempotent_under_overlap(spark, sf_dir):
    """Replayed partials (the same day materialized twice) must not
    overcount — bitmap OR is idempotent, the property that makes the
    stored-partial rollup safe to re-run."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    partials = SK.bitmap_partials(ev, ["event_type", "day"], "user_id")
    one_day = partials.where(F.col("day") == "2024-01-02")
    doubled = partials.unionAll(one_day)  # simulate a replayed day
    got = {
        r["event_type"]: r["distinct_count"]
        for r in SK.merge_bitmap_partials(doubled, ["event_type"]).collect()
    }
    want = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert got == want


def test_approx_topk_heavy_hitters(spark, sf_dir):
    """k < cardinality: the returned items must be the true top-k set
    (slot count >> cardinality here, so sketch counts are exact)."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    exact = (
        ev.groupBy("event_type").count().orderBy(F.col("count").desc()).collect()
    )
    k = 2
    # only meaningful when the k-th and (k+1)-th counts differ
    assert exact[k - 1]["count"] > exact[k]["count"]
    got = SK.approx_top_k(ev.withColumn("g", F.lit(1)), ["g"], "event_type", k=k)
    rows = got.collect()
    assert len(rows) == k
    assert {r["item"] for r in rows} == {r["event_type"] for r in exact[:k]}
    for r in rows:
        true = next(e["count"] for e in exact if e["event_type"] == r["item"])
        assert r["est_count"] == true
