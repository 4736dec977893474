"""Scalar function pack F1-F13 (SURVEY.md §2.8).

Every helper is a pure Column expression built from pyspark.sql.functions
built-ins — no Python UDFs anywhere, so everything stays inside Catalyst /
whole-stage codegen and is 100-TB viable.  Reference citations per helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MYSHOPIFY_SUFFIX = ".myshopify.com"
MYSHOPIFY_SUFFIX_RE = r"\.myshopify\.com$"


def strip_suffix(col: Column | str, pattern: str = MYSHOPIFY_SUFFIX_RE) -> Column:
    """F1 — anchored REGEXP_REPLACE strip (reference src/services/bigquery.ts:44)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, pattern, "")


def event_day(ts: Column | str) -> Column:
    """F2 — DATE(timestamp) truncation, UTC (reference src/services/bigquery.ts:48)."""
    return F.to_date(ts)


def date_literal(d: str) -> Column:
    """F3 — DATE('literal') cast (reference src/services/bigquery.ts:48,156,180)."""
    return F.lit(d).cast("date")


def target_date(tz: str = "Asia/Tokyo", as_of: Column | None = None) -> Column:
    """F4 — tz-aware "yesterday" (reference src/services/billing.ts:242-247).

    dayjs().tz(tz).subtract(1,'day').format('YYYY-MM-DD') as a Column.
    `as_of` injects the UTC instant "now" (default wall clock) so the
    computation is testable against a timezone oracle.
    """
    now = F.current_timestamp() if as_of is None else as_of
    local_today = F.to_date(F.from_utc_timestamp(now, tz))
    return F.date_format(F.date_sub(local_today, 1), "yyyy-MM-dd")


def usage_amount(page_views: Column | str, rate_per_million: float = 10.0) -> Column:
    """F5 — usage->amount math with ROUND(x, 2) HALF_UP
    (reference src/services/billing.ts:276-280, rate :20)."""
    pv = F.col(page_views) if isinstance(page_views, str) else page_views
    return F.round(pv / F.lit(1_000_000.0) * F.lit(rate_per_million), 2)


def money_2dp(col: Column | str) -> Column:
    """F6 — money -> 2dp string, `amount.toFixed(2)`
    (reference src/services/shopifyBilling.ts:209)."""
    return F.format_string("%.2f", F.col(col) if isinstance(col, str) else col)


def ensure_suffix(col: Column | str, suffix: str = MYSHOPIFY_SUFFIX) -> Column:
    """F7+F11 — suffix test + conditional concat
    (reference src/services/shopifyBilling.ts:240-242)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.endswith(suffix), c).otherwise(F.concat(c, F.lit(suffix)))


def iso_date(ts: Column | str) -> Column:
    """F8 — ISO date string from timestamp, `toISOString().split('T')[0]`
    (reference src/index.ts:51,79)."""
    return F.date_format(ts, "yyyy-MM-dd")


def grouped_number(col: Column | str, decimals: int = 0) -> Column:
    """F9 — number grouping format, `toLocaleString()`
    (reference src/services/billing.ts:175-176)."""
    return F.format_number(F.col(col) if isinstance(col, str) else col, decimals)


def truncate_str(col: Column | str, n: int = 1000) -> Column:
    """F10 — substring/truncate, `stack.substring(0, 1000)`
    (reference src/services/slack.ts:191)."""
    return F.substring(F.col(col) if isinstance(col, str) else col, 1, n)


def json_get(col: Column | str, path: str) -> Column:
    """F12 — JSON extraction (reference src/services/shopifyBilling.ts:247-259;
    exercised over the testdata `events.props` JSON column)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path)


def coalesce0(col: Column | str) -> Column:
    """F13 — null-coalescing default 0, `charges.get(shop) || 0`
    (reference src/services/shopifyBilling.ts:66)."""
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(0))
