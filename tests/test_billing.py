"""Billing pipeline unit tests — mirrors the reference's only unit
suite (src/test/shopifyBilling.test.ts) plus the billing math it never
tested (calculateBillingAmount, billing.ts:276-280)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixelspark.ops import billing as B
from pixelspark.ops.scalar import usage_amount
from pixelspark.schemas import load_table


def test_usage_amount_round_parity(spark):
    # JS Math.round(pv/1e6*10*100)/100 — half-up for non-negative values
    cases = [(0, 0.0), (1, 0.0), (500, 0.01), (1_000_000, 10.0), (1_234_567, 12.35),
             (50_000, 0.5), (125_000, 1.25), (2_500, 0.03)]
    df = spark.createDataFrame([(pv,) for pv, _ in cases], "page_views long")
    got = {r["page_views"]: r["amount"] for r in
           df.select("page_views", usage_amount("page_views").alias("amount")).collect()}
    for pv, want in cases:
        assert got[pv] == want, (pv, got[pv], want)


def test_daily_billing_matches_manual_count(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    bill = B.daily_billing(customer, events, "2024-01-02")
    manual = (
        events.where((F.col("event_type") == "view") & (F.to_date("ts") == "2024-01-02"))
        .groupBy("user_id").count().collect()
    )
    want = {r["user_id"]: r["count"] for r in manual}
    got = {r["shop"]: r["page_views"] for r in bill.collect()}
    assert len(got) == customer.count()  # every session row survives (left join)
    for shop, pv in want.items():
        assert got[shop] == pv
    assert all(v == 0 for k, v in got.items() if k not in want)  # coalesce-0


def test_zero_amount_skip_and_status(spark, sf_dir):
    # zero/negative amount -> 'skipped', else 'pending' (shopifyBilling.ts:68-74)
    plan = B.charge_plan(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "events"), "2024-01-02"
    )
    rows = plan.collect()
    for r in rows:
        if r["amount"] <= 0:
            assert r["status"] == "skipped"
        else:
            assert r["status"] == "pending"
    assert {r["status"] for r in rows} <= {"skipped", "pending"}


def test_billing_totals(spark, sf_dir):
    bill = B.daily_billing(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "events"), "2024-01-02"
    )
    t = B.billing_totals(bill).collect()[0]
    assert t["n_records"] == 150
    assert t["total_page_views"] == sum(r["page_views"] for r in bill.collect())


def test_broadcast_join_in_plan(spark, sf_dir):
    # the dim side must be broadcast — no shuffle of the aggregated side
    bill = B.daily_billing(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "events"), "2024-01-02"
    )
    plan = bill._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_day_filter_both_ts_layouts(spark, sf_dir):
    """day_filter must produce identical day membership on every
    physical ts layout it supports: native timestamp (current testdata,
    pushed as a typed range), legacy int64-nanos exposed as ts_ns
    (pushed as an int64 range), and a plain date-cast fallback.  The
    legacy branch is dead code against the regenerated testdata, so
    this synthetic frame keeps it regression-tested."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    # rebuild the legacy layout from the timestamp: ns = unix_micros * 1000
    legacy = events.select(
        "event_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("ts_ns"),
        F.col("ts"),
    )
    d = "2024-01-02"
    want = {r["event_id"] for r in events.where(B.day_filter(events, d)).collect()}
    got_legacy = {r["event_id"] for r in legacy.where(B.day_filter(legacy, d)).collect()}
    assert got_legacy == want and len(want) > 0
    # range filter semantics == date-cast semantics
    got_cast = {
        r["event_id"]
        for r in events.where(F.to_date("ts") == F.lit(d).cast("date")).collect()
    }
    assert got_cast == want
    # and the range reaches the parquet scan as pushed filters
    plan = (
        load_table(spark, sf_dir, "events")
        .where(B.day_filter(load_table(spark, sf_dir, "events"), d))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(ts," in plan and "LessThan(ts," in plan


def test_day_range_filter_half_open(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    got = events.where(B.day_range_filter(events, "2024-01-02", "2024-01-04"))
    days = {r["d"] for r in got.select(F.to_date("ts").alias("d")).distinct().collect()}
    assert {str(d) for d in days} == {"2024-01-02", "2024-01-03"}  # end exclusive
