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


# ---------------------------------------------------------------------------
# Error-bound gates for the approximate pack: the driver records these
# queries rows-only (estimates are engine-specific), so accuracy is
# pinned HERE, against exact answers, at a scale (sf0.1) where the
# published bounds are meaningful — the same stance as the ANN
# recall@5 >= 0.9 gate in test_llm.py.
# ---------------------------------------------------------------------------

import os

import pytest

SF_BOUND = "/root/testdata/sf0.1"
needs_sf01 = pytest.mark.skipif(
    not os.path.isdir(SF_BOUND), reason="sf0.1 testdata not generated"
)


@needs_sf01
def test_approx_distinct_within_published_rsd(spark):
    """q_approx_distinct runs HLL++ at rsd=0.02; the standard error of
    the estimator IS rsd, so every per-group estimate must sit within
    3*rsd (3-sigma) of the exact distinct count."""
    from pixelspark.queries import QUERIES

    got = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["q_approx_distinct"](spark, SF_BOUND).collect()
    }
    ev = load_table(spark, SF_BOUND, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact) and exact
    for et, n in exact.items():
        rel = abs(got[et] - n) / n
        assert rel <= 3 * 0.02, f"{et}: approx {got[et]} vs exact {n} (rel {rel:.4f})"


@needs_sf01
def test_approx_quantiles_within_declared_rank_accuracy(spark):
    """q_approx_quantiles uses Greenwald-Khanna at accuracy=10000, i.e.
    rank error <= 1/10000.  Each estimate must therefore lie between
    the EXACT percentiles at q +/- eps (small interpolation slack)."""
    from pixelspark.queries import QUERIES

    eps = 2.0 / 10000  # declared 1/acc + interpolation slack
    got = {
        r["event_type"]: r["q50_90_99"]
        for r in QUERIES["q_approx_quantiles"](spark, SF_BOUND).collect()
    }
    ev = load_table(spark, SF_BOUND, "events")
    for q_idx, q in enumerate((0.5, 0.9, 0.99)):
        lo_q, hi_q = max(q - eps, 0.0), min(q + eps, 1.0)
        bounds = {
            r["event_type"]: (r["lo"], r["hi"])
            for r in ev.groupBy("event_type")
            .agg(
                F.expr(f"percentile(value, {lo_q})").alias("lo"),
                F.expr(f"percentile(value, {hi_q})").alias("hi"),
            )
            .collect()
        }
        assert set(got) == set(bounds) and bounds
        for et, (lo, hi) in bounds.items():
            est = got[et][q_idx]
            assert lo <= est <= hi, (
                f"{et} p{int(q * 100)}: {est} outside exact[{lo_q},{hi_q}] = "
                f"[{lo}, {hi}]"
            )


@needs_sf01
def test_hll_sketch_merge_matches_oneshot_and_exact(spark):
    """q_hll_sketch merges per-day sketches (lgk=12, rsd ~= 1.04/2^6 =
    1.6%): both the merged estimate and a one-shot whole-table sketch
    must sit within 5% (~3-sigma) of the exact distinct count.  The two
    are NOT asserted equal: Datasketches unions promote sparse
    (coupon-mode, near-exact) sketches to the dense HLL array, so at
    low cardinality the merged estimate legitimately differs from the
    one-shot sketch — only the error BOUND is invariant."""
    from pixelspark.queries import QUERIES

    merged = QUERIES["q_hll_sketch"](spark, SF_BOUND).collect()[0]["approx_users"]
    ev = load_table(spark, SF_BOUND, "events")
    oneshot = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
        .cast("long")
        .alias("n")
    ).collect()[0]["n"]
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    for label, est in (("merged", merged), ("one-shot", oneshot)):
        rel = abs(est - exact) / exact
        assert rel <= 0.05, f"{label} {est} vs exact {exact} (rel {rel:.4f})"
