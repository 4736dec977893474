"""S9 — report sink: the aggregation feeding driver-side formatting
(reference src/services/slack.ts:29-303).  Spark computes the filter /
top-N / totals / status counts; only the final tiny result is collected
driver-side for formatting — never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pixelspark.ops.scalar import grouped_number, money_2dp

MAX_SHOPS_TO_SHOW = 10  # reference src/services/slack.ts:215-216


def report_rows(billing: DataFrame, max_shops: int = MAX_SHOPS_TO_SHOW) -> DataFrame:
    """Active shops (>0 views), top-N by views, formatted strings
    (reference slack.ts:199-216)."""
    return (
        billing.where(F.col("page_views") > 0)
        .select(
            "shop",
            "page_views",
            grouped_number("page_views").alias("page_views_str"),
            money_2dp(F.col("billing_amount")).alias("amount_str"),
        )
        .orderBy(F.col("page_views").desc(), F.col("shop").asc())
        .limit(max_shops)
    )


def build_report(billing: DataFrame, status_counts: DataFrame | None = None) -> dict:
    """Assemble the report payload: totals + top shops (+ status
    counts), collecting only aggregated rows."""
    totals = billing.agg(
        F.round(F.sum("billing_amount"), 2).alias("total_amount"),
        F.sum("page_views").cast("long").alias("total_page_views"),
        F.count(F.lit(1)).alias("n_shops"),
    ).collect()[0]
    top = [r.asDict() for r in report_rows(billing).collect()]
    payload = {
        "total_amount": totals["total_amount"],
        "total_page_views": totals["total_page_views"],
        "n_shops": totals["n_shops"],
        "top_shops": top,
    }
    if status_counts is not None:
        payload["status_counts"] = {r["status"]: r["n"] for r in status_counts.collect()}
    return payload
