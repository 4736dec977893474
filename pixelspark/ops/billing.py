"""The domain pipeline — faithful Spark-first translation of the
reference's daily usage-billing dataflow (src/services/billing.ts,
src/services/bigquery.ts) onto the driver testdata mapping (FIXTURES.md:
`events` plays ad_analytics.events with `event_type='view'` as
page_viewed and `user_id` as the shop key; `customer` plays the
shopify_sessions dimension).

Scale posture: the page-view aggregation is a partial-aggregated
shuffle on the shop key (map-side combine is automatic for count);
the dimension side of the billing join is broadcast so the big fact
aggregation never shuffles twice.  Day filtering is applied directly on
the parquet scan so predicate pushdown + (on a date-partitioned layout)
partition pruning kick in.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pixelspark.ops.scalar import date_literal, event_day, usage_amount

RATE_PER_MILLION = 10.0  # reference src/services/billing.ts:20
PAGE_VIEW_EVENT = "view"  # plays name='page_viewed' (bigquery.ts:47)


def _next_day(d: str) -> str:
    return (_dt.date.fromisoformat(d) + _dt.timedelta(days=1)).isoformat()


def _ts_bound(df: DataFrame, day: str) -> Column:
    """Midnight of `day` as a literal of ts's OWN type (TIMESTAMP or
    TIMESTAMP_NTZ) — same-type comparisons are what parquet pushdown
    accepts; a mixed-type compare inserts a cast and loses the scan
    filter."""
    return F.lit(f"{day} 00:00:00").cast(df.schema["ts"].dataType)


def day_filter(df: DataFrame, target_date: str) -> Column:
    """UTC-day predicate on the event timestamp, written to push down.

    The day becomes a half-open RANGE directly on the scan column —
    parquet row-group stats then skip whole chunks, which
    `to_date(ts) = d` over a derived expression can never do.  This is
    the predicate that makes the daily batch a partition-pruned read
    at 100 TB.  Handles both physical layouts the testdata has used:
    raw int64 nanos (exposed as `ts_ns`) and native timestamp[us]
    (TIMESTAMP / TIMESTAMP_NTZ).
    """
    if "ts_ns" in df.columns:
        day = _dt.datetime.strptime(target_date, "%Y-%m-%d").replace(
            tzinfo=_dt.timezone.utc
        )
        lo = int(day.timestamp()) * 1_000_000_000
        hi = lo + 86_400 * 1_000_000_000
        return (F.col("ts_ns") >= F.lit(lo)) & (F.col("ts_ns") < F.lit(hi))
    if isinstance(df.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)):
        return (F.col("ts") >= _ts_bound(df, target_date)) & (
            F.col("ts") < _ts_bound(df, _next_day(target_date))
        )
    return event_day("ts") == date_literal(target_date)


def day_range_filter(df: DataFrame, start_date: str, end_date: str) -> Column:
    """Half-open [start, end) UTC-day range predicate, pushdown-shaped
    like day_filter."""
    if "ts_ns" in df.columns:
        def ns(d: str) -> int:
            day = _dt.datetime.strptime(d, "%Y-%m-%d").replace(tzinfo=_dt.timezone.utc)
            return int(day.timestamp()) * 1_000_000_000

        return (F.col("ts_ns") >= F.lit(ns(start_date))) & (F.col("ts_ns") < F.lit(ns(end_date)))
    if isinstance(df.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)):
        return (F.col("ts") >= _ts_bound(df, start_date)) & (
            F.col("ts") < _ts_bound(df, end_date)
        )
    return (event_day("ts") >= date_literal(start_date)) & (
        event_day("ts") < date_literal(end_date)
    )


def sessions_scan(customer: DataFrame) -> DataFrame:
    """S1/P1/P2/P5 — session dimension scan: projection w/ aliasing,
    NOT-NULL + non-empty conjunctive filter, derived session_id
    (reference src/services/bigquery.ts:19-39)."""
    return (
        customer.where(
            F.col("c_name").isNotNull()
            & (F.col("c_name") != "")
            & F.col("c_mktsegment").isNotNull()
            & (F.col("c_mktsegment") != "")
        )
        .select(
            F.col("c_custkey").alias("shop"),
            F.col("c_name").alias("shop_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .withColumn("session_id", F.col("shop_name"))
    )


def pageviews_agg(events: DataFrame, target_date: str) -> DataFrame:
    """A1/P3/P4/F2 — COUNT(*) page views per shop for one UTC day
    (reference src/services/bigquery.ts:41-56).

    Filter sits directly on the scan -> parquet predicate pushdown; the
    groupBy count partial-aggregates map-side before the shuffle.
    """
    return (
        events.where(
            (F.col("event_type") == PAGE_VIEW_EVENT) & day_filter(events, target_date)
        )
        .groupBy(F.col("user_id").alias("shop"))
        .agg(F.count(F.lit(1)).alias("event_count"))
    )


def daily_billing(
    customer: DataFrame,
    events: DataFrame,
    target_date: str,
    rate_per_million: float = RATE_PER_MILLION,
) -> DataFrame:
    """J1/F5/F13 — the flagship: sessions LEFT JOIN per-shop counts,
    missing count -> 0, amount = round(pv/1e6 * rate, 2)
    (reference src/services/billing.ts:249-280).

    The aggregated count side is tiny (<= #shops) -> broadcast it so the
    join is a BroadcastHashJoin with no shuffle of the dimension.
    """
    pv = pageviews_agg(events, target_date)
    sessions = customer.select(F.col("c_custkey").alias("shop"))
    return (
        sessions.join(F.broadcast(pv), "shop", "left")
        .withColumn("page_views", F.coalesce(F.col("event_count"), F.lit(0)).cast("long"))
        .withColumn("billing_date", date_literal(target_date))
        .withColumn("billing_amount", usage_amount("page_views", rate_per_million))
        .withColumn("rate_per_million", F.lit(rate_per_million))
        .select("shop", "billing_date", "page_views", "billing_amount", "rate_per_million")
    )


def billing_totals(billing: DataFrame) -> DataFrame:
    """A2/A4 — global sums + cardinality
    (reference src/services/billing.ts:170-176, :182-184)."""
    return billing.agg(
        F.round(F.sum("billing_amount"), 2).alias("total_amount"),
        F.sum("page_views").cast("long").alias("total_page_views"),
        F.count(F.lit(1)).alias("n_records"),
    )


def usage_value_plan(events: DataFrame, target_date: str) -> DataFrame:
    """Per-shop usage value for one day — feeds the charge plan.

    Uses the events `value` measure so the zero-amount skip filter has a
    meaningful split (the reference's amounts come from page-view counts;
    the skip-at-<=0 semantics are identical, shopifyBilling.ts:68-74).
    """
    return (
        events.where(
            (F.col("event_type") == PAGE_VIEW_EVENT) & day_filter(events, target_date)
        )
        .groupBy(F.col("user_id").alias("shop"))
        .agg(F.round(F.sum("value"), 2).alias("amount"))
    )


def charge_plan(customer: DataFrame, events: DataFrame, target_date: str) -> DataFrame:
    """J2/P9/P6 — the charge stage input: projected (shop, amount) map
    broadcast-joined to sessions, zero/negative amounts marked 'skipped',
    the rest 'pending' (reference src/services/billing.ts:126-130 +
    src/services/shopifyBilling.ts:68-74, status mapping billing.ts:136-138).
    """
    usage = usage_value_plan(events, target_date)
    sessions = customer.select(F.col("c_custkey").alias("shop"))
    return (
        sessions.join(F.broadcast(usage), "shop", "left")
        .withColumn("amount", F.round(F.coalesce(F.col("amount"), F.lit(0.0)), 2))
        .withColumn(
            "status",
            F.when(F.col("amount") <= 0, F.lit("skipped")).otherwise(F.lit("pending")),
        )
    )


def status_counts(plan: DataFrame) -> DataFrame:
    """A3 — conditional counts by charge status
    (reference src/services/shopifyBilling.ts:81-84, slack.ts:159-161)."""
    return plan.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def enrich_results(records: DataFrame, results: DataFrame, key: str = "shop") -> DataFrame:
    """J3/F13 — enrich billing records with charge results by shop; the
    reference does a linear Array.find probe (billing.ts:133-149) — here a
    broadcast left join (results side is per-shop, tiny)."""
    return records.join(F.broadcast(results), key, "left")
