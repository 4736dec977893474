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


def format_slack_blocks(payload: dict) -> list[dict]:
    """Block Kit-shaped report (reference src/services/slack.ts:29-150):
    header, totals section, top-shops list, status counts — pure driver
    formatting over the already-aggregated payload."""
    blocks: list[dict] = [
        {"type": "header", "text": {"type": "plain_text", "text": "Daily billing report"}},
        {
            "type": "section",
            "fields": [
                {"type": "mrkdwn", "text": f"*Total amount:* ${payload['total_amount']:.2f}"},
                {"type": "mrkdwn", "text": f"*Total page views:* {payload['total_page_views']:,}"},
                {"type": "mrkdwn", "text": f"*Shops:* {payload['n_shops']:,}"},
            ],
        },
    ]
    if payload.get("top_shops"):
        lines = [
            f"{i + 1}. shop {r['shop']}: {r['page_views_str']} views (${r['amount_str']})"
            for i, r in enumerate(payload["top_shops"])
        ]
        blocks.append(
            {"type": "section", "text": {"type": "mrkdwn", "text": "\n".join(lines)}}
        )
    if payload.get("status_counts"):
        icons = {"success": ":white_check_mark:", "failed": ":x:", "skipped": ":fast_forward:",
                 "pending": ":hourglass:", "duplicate": ":recycle:"}
        parts = [
            f"{icons.get(s, ':grey_question:')} {s}: {n}"
            for s, n in sorted(payload["status_counts"].items())
        ]
        blocks.append({"type": "context", "elements": [{"type": "mrkdwn", "text": " | ".join(parts)}]})
    return blocks
