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


def test_inlist_pushdown_reaches_scan(spark, sf_dir):
    """The collected dim keyset must appear as an In() pushed filter on
    the fact's parquet scan, and the prefiltered join must equal the
    plain join."""
    import contextlib
    import io

    from pixelspark.ops.sketches import inlist_pushdown_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 475000)
        .select("o_orderkey", "o_orderpriority")
    )
    joined = inlist_pushdown_join(li, o, "l_orderkey", "o_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    assert "In(l_orderkey, [" in buf.getvalue()
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert joined.count() == plain.count()


def test_inlist_pushdown_guards_keyset_size(spark, sf_dir):
    import pytest

    from pixelspark.ops.sketches import inlist_pushdown_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="max_keys"):
        inlist_pushdown_join(li, o, "l_orderkey", "o_orderkey", max_keys=10)


def test_sq8_roundtrip_error_bound(spark, sf_dir):
    """Dequantized SQ8 values must sit within half a quantization step
    of the original (the defining property of round-to-nearest codes)."""
    from pixelspark.ops.llm import dequantize_sq8, quantize_sq8

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    codes = quantize_sq8(F.col("embedding"))
    deq = dequantize_sq8(codes, mn, mx)
    worst = emb.select(
        F.greatest(
            F.lit(0.0),
            F.array_max(
                F.zip_with(
                    "embedding",
                    deq,
                    lambda a, b: F.abs(a.cast("double") - b)
                    - (mx - mn) / 255.0 / 2.0
                    - F.lit(1e-9),
                )
            ),
        ).alias("excess")
    ).agg(F.max("excess").alias("m")).collect()[0]["m"]
    assert worst <= 0.0
