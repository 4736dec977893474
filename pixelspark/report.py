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
    counts), collecting only aggregated rows — in ONE Spark job.

    The three report sections have different shapes, so each branch is
    tagged and JSON-packed into a common (part, payload) schema, the
    branches unioned, and the union collected once: ONE driver barrier
    instead of three sequential collect()s (AQE may still split the
    single action into several internal jobs — the property is the
    single action, asserted in tests/test_job.py).  All three sections
    stay tiny — totals is 1 row, top is <= max_shops, status counts is
    a handful."""
    import json

    branches = [
        billing.agg(
            F.round(F.sum("billing_amount"), 2).alias("total_amount"),
            F.sum("page_views").cast("long").alias("total_page_views"),
            F.count(F.lit(1)).alias("n_shops"),
        ).select(F.lit("totals").alias("part"), F.to_json(F.struct("*")).alias("payload")),
        report_rows(billing).select(
            F.lit("top").alias("part"), F.to_json(F.struct("*")).alias("payload")
        ),
    ]
    if status_counts is not None:
        branches.append(
            status_counts.select(
                F.lit("status").alias("part"), F.to_json(F.struct("*")).alias("payload")
            )
        )
    combined = branches[0]
    for b in branches[1:]:
        combined = combined.unionByName(b)
    by_part: dict[str, list[dict]] = {}
    for r in combined.collect():  # the single driver pass
        by_part.setdefault(r["part"], []).append(json.loads(r["payload"]))
    totals = by_part["totals"][0]
    # union does not guarantee branch row order: re-apply report_rows'
    # ordering driver-side (<= max_shops rows)
    top = sorted(by_part.get("top", []), key=lambda r: (-r["page_views"], r["shop"]))
    payload = {
        "total_amount": totals.get("total_amount"),
        "total_page_views": totals.get("total_page_views"),
        "n_shops": totals["n_shops"],
        "top_shops": top,
    }
    if status_counts is not None:
        payload["status_counts"] = {
            r["status"]: r["n"] for r in by_part.get("status", [])
        }
    return payload


STATUS_ICON = {  # per-shop Shopify status icons (slack.ts:222-225)
    "success": "✅",
    "failed": "❌",
    "skipped": "⏭️",
}
PENDING_ICON = "⏳"  # any other status (slack.ts:225)


def _status_text(status: str) -> str:
    """getShopifyStatusText equivalent (slack.ts:305-316)."""
    return {
        "success": "charge created",
        "failed": "charge failed",
        "skipped": "skipped",
        "duplicate": "already charged",
    }.get(status, "pending")


def format_slack_blocks(
    payload: dict,
    success: bool = True,
    message: str = "Daily billing batch",
    timestamp: str = "",
    target_date: str = "",
    skipped: bool = False,
    skip_reason: str | None = None,
    error_details: dict | None = None,
    shop_results: list[dict] | None = None,
    max_shops: int = MAX_SHOPS_TO_SHOW,
) -> list[dict]:
    """Block Kit report with the reference's exact block structure
    (src/services/slack.ts:61-262), section by section:

    1. header with success/error icon (:65-68)
    2. status + timestamp field pair (:70-83)
    3. message section (:84-90)
    4. target-date + run/skip field pair (:95-108)
    5. skip-reason section when skipped (:110-118)
    6. two field-pair sections: sessions/shops-with-views and
       records/total-page-views, then the total-amount section
       (:120-155)
    7. charge-results summary with ✅/❌/⏭️ counts (:157-177)
    8. error details + truncated stack sections (:180-199)
    9. divider + per-shop detail section (only shops with activity,
       first `max_shops`, per-shop save/charge icons + error lines)
       and the '... N more' truncation note (:201-262)

    Pure driver-side formatting over the already-aggregated payload —
    Spark computed every number; nothing row-scale is collected here.
    """
    blocks: list[dict] = [
        {
            "type": "header",
            "text": {
                "type": "plain_text",
                "text": "✅ Batch completed" if success else "❌ Batch error",
            },
        },
        {
            "type": "section",
            "fields": [
                {"type": "mrkdwn", "text": f"*Status:*\n{'success' if success else 'failure'}"},
                {"type": "mrkdwn", "text": f"*Run at:*\n{timestamp}"},
            ],
        },
        {"type": "section", "text": {"type": "mrkdwn", "text": f"*Message:*\n{message}"}},
        {
            "type": "section",
            "fields": [
                {"type": "mrkdwn", "text": f"*Target date:*\n{target_date}"},
                {"type": "mrkdwn", "text": f"*Result:*\n{'⏭️ skipped' if skipped else '✅ executed'}"},
            ],
        },
    ]
    if skipped and skip_reason:
        blocks.append(
            {"type": "section", "text": {"type": "mrkdwn", "text": f"*Skip reason:*\n{skip_reason}"}}
        )
    if not skipped:
        n_shops = payload.get("n_shops", 0)
        # branch on presence, not truthiness: zero active shops is a
        # legitimate count and must not fall through to the payload value
        if shop_results is not None:
            n_active = sum(1 for r in shop_results if r.get("page_views", 0) > 0)
        else:
            n_active = payload.get("n_active_shops", 0)
        blocks.append(
            {
                "type": "section",
                "fields": [
                    {"type": "mrkdwn", "text": f"*Active sessions:*\n{n_shops:,}"},
                    {"type": "mrkdwn", "text": f"*Shops with page views:*\n{n_active:,}"},
                ],
            }
        )
        blocks.append(
            {
                "type": "section",
                "fields": [
                    {"type": "mrkdwn", "text": f"*Billing records:*\n{n_shops:,}"},
                    {"type": "mrkdwn", "text": f"*Total page views:*\n{payload['total_page_views']:,}"},
                ],
            }
        )
        blocks.append(
            {
                "type": "section",
                "text": {"type": "mrkdwn", "text": f"*Total amount:*\n${payload['total_amount']:.2f}"},
            }
        )
        if payload.get("status_counts"):
            sc = payload["status_counts"]
            blocks.append(
                {
                    "type": "section",
                    "fields": [
                        {
                            "type": "mrkdwn",
                            "text": (
                                "*Shopify charge results:*\n"
                                f"✅ success: {sc.get('success', 0)}\n"
                                f"❌ failed: {sc.get('failed', 0)}\n"
                                f"⏭️ skipped: {sc.get('skipped', 0)}"
                            ),
                        }
                    ],
                }
            )
    if error_details:
        blocks.append(
            {
                "type": "section",
                "text": {"type": "mrkdwn", "text": f"*🔴 Error details:*\n```{error_details['message']}```"},
            }
        )
        if error_details.get("stack"):
            blocks.append(
                {
                    "type": "section",
                    "text": {
                        "type": "mrkdwn",
                        "text": f"*🔍 Stack trace:*\n```{error_details['stack'][:1000]}```",
                    },
                }
            )
    active = [r for r in (shop_results or []) if r.get("page_views", 0) > 0]
    if active:
        blocks.append({"type": "divider"})
        blocks.append(
            {"type": "section", "text": {"type": "mrkdwn", "text": "*📊 Per-shop results:*"}}
        )
        details = []
        for r in active[:max_shops]:
            save_icon = "✅" if r.get("saved", True) else "❌"
            status = r.get("shopify_status", "pending")
            lines = [
                f"*{r['shop']}*",
                f"📊 {r['page_views']:,} views / ${r['billing_amount']}",
                f"{save_icon} save {'succeeded' if r.get('saved', True) else 'failed'}",
                f"{STATUS_ICON.get(status, PENDING_ICON)} Shopify {_status_text(status)}",
            ]
            if r.get("save_error"):
                lines.append(f"🔴 save error: {r['save_error']}")
            if r.get("shopify_error"):
                lines.append(f"🔴 Shopify error: {r['shopify_error']}")
            details.append("\n".join(lines))
        blocks.append(
            {"type": "section", "text": {"type": "mrkdwn", "text": "\n\n".join(details)}}
        )
        if len(active) > max_shops:
            blocks.append(
                {
                    "type": "section",
                    "text": {
                        "type": "mrkdwn",
                        "text": f"_... {len(active) - max_shops} more shops omitted_",
                    },
                }
            )
    return blocks
