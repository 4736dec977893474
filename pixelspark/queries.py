"""Query registry — every operator from SURVEY.md §2 as a (Spark
callable, DuckDB oracle SQL) pair, consumed by __spark_entry__.py.

Conventions (driver contract):
  * each callable takes (spark, sf_dir) and returns a DataFrame
  * every computed column is aliased IDENTICALLY in Spark and oracle SQL
  * aggregates of BIGINT are cast to BIGINT in DuckDB (its SUM(BIGINT)
    returns HUGEINT) and to long in Spark where needed
  * double aggregates are rounded at a single point in both engines so
    cross-engine float summation order cannot flip the compared value
  * queries with no oracle entry (non-deterministic or not
    SQL-expressible) get the driver's rows-only check
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pixelspark.ops import billing as B
from pixelspark.ops import scalar as S
from pixelspark.schemas import load_table

# Flagship target date — exists in events (range 2024-01-01..2024-01-30).
TD = "2024-01-02"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# M0 — flagship billing pipeline
# ---------------------------------------------------------------------------

@query(
    "q_daily_billing",
    f"""
    WITH pv AS (
      SELECT user_id AS shop, CAST(COUNT(*) AS BIGINT) AS event_count
      FROM events
      WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
      GROUP BY user_id
    )
    SELECT c.c_custkey AS shop,
           DATE '{TD}' AS billing_date,
           CAST(COALESCE(pv.event_count, 0) AS BIGINT) AS page_views,
           ROUND(COALESCE(pv.event_count, 0) / 1000000.0 * 10.0, 2) AS billing_amount,
           10.0 AS rate_per_million
    FROM customer c LEFT JOIN pv ON c.c_custkey = pv.shop
    """,
)
def q_daily_billing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A1+F5+F13 flagship (reference src/services/billing.ts:249-280 +
    src/services/bigquery.ts:41-56)."""
    return B.daily_billing(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "events"), TD)


@query(
    "q_sessions_scan",
    """
    SELECT c_custkey AS shop, c_name AS shop_name, c_mktsegment AS segment,
           c_acctbal AS acctbal, c_name AS session_id
    FROM customer
    WHERE c_name IS NOT NULL AND c_name <> ''
      AND c_mktsegment IS NOT NULL AND c_mktsegment <> ''
    """,
)
def q_sessions_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1/P2/P5 (reference src/services/bigquery.ts:19-39)."""
    return B.sessions_scan(_t(spark, sf_dir, "customer"))


@query(
    "q_pageviews_agg",
    f"""
    SELECT user_id AS shop, CAST(COUNT(*) AS BIGINT) AS event_count
    FROM events
    WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
    GROUP BY user_id
    """,
)
def q_pageviews_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/P3/P4/F2 (reference src/services/bigquery.ts:41-56)."""
    return B.pageviews_agg(_t(spark, sf_dir, "events"), TD)


@query(
    "q_billing_totals",
    f"""
    WITH pv AS (
      SELECT user_id AS shop, CAST(COUNT(*) AS BIGINT) AS event_count
      FROM events
      WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
      GROUP BY user_id
    ), bill AS (
      SELECT COALESCE(pv.event_count, 0) AS page_views,
             ROUND(COALESCE(pv.event_count, 0) / 1000000.0 * 10.0, 2) AS billing_amount
      FROM customer c LEFT JOIN pv ON c.c_custkey = pv.shop
    )
    SELECT ROUND(SUM(billing_amount), 2) AS total_amount,
           CAST(SUM(page_views) AS BIGINT) AS total_page_views,
           CAST(COUNT(*) AS BIGINT) AS n_records
    FROM bill
    """,
)
def q_billing_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4 (reference src/services/billing.ts:170-176,182-184)."""
    bill = B.daily_billing(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "events"), TD)
    return B.billing_totals(bill)


@query(
    "q_charge_plan",
    f"""
    WITH usage AS (
      SELECT user_id AS shop, ROUND(SUM(value), 2) AS amount
      FROM events
      WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
      GROUP BY user_id
    )
    SELECT c.c_custkey AS shop,
           ROUND(COALESCE(u.amount, 0.0), 2) AS amount,
           CASE WHEN ROUND(COALESCE(u.amount, 0.0), 2) <= 0
                THEN 'skipped' ELSE 'pending' END AS status
    FROM customer c LEFT JOIN usage u ON c.c_custkey = u.shop
    """,
)
def q_charge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/P9/P6 (reference src/services/shopifyBilling.ts:68-74,
    billing.ts:126-130)."""
    return B.charge_plan(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "events"), TD)


@query(
    "q_status_counts",
    f"""
    WITH usage AS (
      SELECT user_id AS shop, ROUND(SUM(value), 2) AS amount
      FROM events
      WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
      GROUP BY user_id
    ), plan AS (
      SELECT CASE WHEN ROUND(COALESCE(u.amount, 0.0), 2) <= 0
                  THEN 'skipped' ELSE 'pending' END AS status
      FROM customer c LEFT JOIN usage u ON c.c_custkey = u.shop
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM plan GROUP BY status
    """,
)
def q_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (reference src/services/shopifyBilling.ts:81-84)."""
    plan = B.charge_plan(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "events"), TD)
    return B.status_counts(plan)


# ---------------------------------------------------------------------------
# M1 — scan / filter / project / scalar pack
# ---------------------------------------------------------------------------

@query(
    "q_records_for_date",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-02-01'
    """,
)
def q_records_for_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/P4/F8 — date-filtered read-back
    (reference src/services/bigquery.ts:147-166)."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        (F.to_date("o_orderdate") >= S.date_literal("1996-01-01"))
        & (F.to_date("o_orderdate") < S.date_literal("1996-02-01"))
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        S.iso_date("o_orderdate").alias("order_day"),
    )


@query(
    "q_status_case",
    """
    SELECT event_id,
           event_type,
           CASE event_type WHEN 'error' THEN 'failed'
                           WHEN 'purchase' THEN 'success'
                           ELSE 'pending' END AS status
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-01' AND CAST(ts AS DATE) < DATE '2024-01-08'
    """,
)
def q_status_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — CASE WHEN status mapping (reference src/services/billing.ts:136-138)."""
    e = _t(spark, sf_dir, "events")
    return e.where(
        (F.to_date("ts") >= S.date_literal("2024-01-01"))
        & (F.to_date("ts") < S.date_literal("2024-01-08"))
    ).select(
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "error", "failed")
        .when(F.col("event_type") == "purchase", "success")
        .otherwise("pending")
        .alias("status"),
    )


@query(
    "q_regex_strip",
    r"""
    SELECT p_partkey, p_type,
           regexp_replace(p_type, ' [A-Z]+$', '') AS type_base,
           regexp_replace(p_name || '.myshopify.com', '\.myshopify\.com$', '') AS shop
    FROM part
    """,
)
def q_regex_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — anchored regexp_replace (reference src/services/bigquery.ts:44)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        S.strip_suffix("p_type", r" [A-Z]+$").alias("type_base"),
        S.strip_suffix(F.concat(F.col("p_name"), F.lit(".myshopify.com"))).alias("shop"),
    )


@query(
    "q_domain_fix",
    """
    SELECT c_custkey,
           CASE WHEN c_name LIKE '%.myshopify.com' THEN c_name
                ELSE c_name || '.myshopify.com' END AS shop_domain,
           'Usage charge for ' || c_name AS charge_description
    FROM customer
    """,
)
def q_domain_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F11 — ensure-suffix + string template concat
    (reference src/services/shopifyBilling.ts:240-242, :212)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        S.ensure_suffix("c_name").alias("shop_domain"),
        F.concat(F.lit("Usage charge for "), F.col("c_name")).alias("charge_description"),
    )


@query(
    "q_money_format",
    """
    SELECT o_orderkey,
           printf('%.2f', ROUND(o_totalprice, 2)) AS price_str,
           format('{:,}', CAST(FLOOR(o_totalprice) AS BIGINT)) AS price_grouped
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    """,
)
def q_money_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F9 — money->2dp string + grouped number format
    (reference src/services/shopifyBilling.ts:209, billing.ts:175-176)."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        (F.to_date("o_orderdate") >= S.date_literal("1996-01-01"))
        & (F.to_date("o_orderdate") < S.date_literal("1997-01-01"))
    ).select(
        "o_orderkey",
        S.money_2dp(F.round(F.col("o_totalprice"), 2)).alias("price_str"),
        S.grouped_number(F.floor("o_totalprice").cast("long")).alias("price_grouped"),
    )


@query(
    "q_substr",
    """
    SELECT doc_id, substring(text, 1, 100) AS excerpt, n_chars
    FROM documents
    """,
)
def q_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — substring/truncate (reference src/services/slack.ts:191)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", S.truncate_str("text", 100).alias("excerpt"), "n_chars")


@query(
    "q_json_extract",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-02'
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — JSON extraction over events.props
    (reference src/services/shopifyBilling.ts:247-259)."""
    e = _t(spark, sf_dir, "events")
    return e.where(F.to_date("ts") == S.date_literal(TD)).select(
        "event_id",
        S.json_get("props", "$.k").alias("k_str"),
        S.json_get("props", "$.k").cast("long").alias("k"),
    )


@query("q_target_date")  # current_timestamp-dependent -> rows-only check
def q_target_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F8 — tz-aware 'yesterday' (reference src/services/billing.ts:242-247).
    Non-deterministic (wall clock) -> no SQL oracle."""
    return spark.range(1).select(
        S.target_date("Asia/Tokyo").alias("target_date_jst"),
        S.iso_date(F.current_timestamp()).alias("today_utc"),
    )


# ---------------------------------------------------------------------------
# M2 — aggregate / join / set-op pack
# ---------------------------------------------------------------------------

@query(
    "q_unbilled_shops",
    f"""
    SELECT c_custkey AS shop FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM events e
      WHERE e.user_id = c.c_custkey AND e.event_type = 'view'
        AND CAST(e.ts AS DATE) = DATE '{TD}'
    )
    """,
)
def q_unbilled_shops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 anti — sessions with no page views that day
    (reference consequence of src/services/billing.ts:260-271)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("shop"))
    pv = B.pageviews_agg(_t(spark, sf_dir, "events"), TD)
    return c.join(F.broadcast(pv), "shop", "left_anti")


@query(
    "q_billed_shops_semi",
    f"""
    SELECT c_custkey AS shop FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM events e
      WHERE e.user_id = c.c_custkey AND e.event_type = 'view'
        AND CAST(e.ts AS DATE) = DATE '{TD}'
    )
    """,
)
def q_billed_shops_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 semi — the complement check."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("shop"))
    pv = B.pageviews_agg(_t(spark, sf_dir, "events"), TD)
    return c.join(F.broadcast(pv), "shop", "left_semi")


@query(
    "q_enrich_results",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           COALESCE(c.c_name, '') AS customer_name,
           COALESCE(c.c_mktsegment, '') AS segment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-02-01'
    """,
)
def q_enrich_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/F13 — lookup left join with null-coalescing defaults
    (reference src/services/billing.ts:133-149)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= S.date_literal("1996-01-01"))
        & (F.to_date("o_orderdate") < S.date_literal("1996-02-01"))
    )
    c = _t(spark, sf_dir, "customer")
    return B.enrich_results(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.coalesce("c_name", F.lit("")).alias("customer_name"),
        F.coalesce("c_mktsegment", F.lit("")).alias("segment"),
    )


@query(
    "q_union_all",
    f"""
    SELECT event_id, event_type FROM events
    WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '{TD}'
    UNION ALL
    SELECT event_id, event_type FROM events
    WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — UNION ALL (engine surface; the reference's insert-twice
    pattern is physically a union, src/services/billing.ts:92,162)."""
    e = _t(spark, sf_dir, "events")
    day = F.to_date("ts") == S.date_literal(TD)
    a = e.where((F.col("event_type") == "click") & day).select("event_id", "event_type")
    b = e.where((F.col("event_type") == "view") & day).select("event_id", "event_type")
    return a.unionByName(b)


@query(
    "q_except",
    f"""
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '{TD}'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — EXCEPT (distinct) over user sets."""
    e = _t(spark, sf_dir, "events")
    day = F.to_date("ts") == S.date_literal(TD)
    a = e.where((F.col("event_type") == "purchase") & day).select("user_id")
    b = e.where((F.col("event_type") == "view") & day).select("user_id")
    return a.subtract(b)


@query(
    "q_daily_active_users",
    """
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY CAST(ts AS DATE)
    """,
)
def q_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext — distinct aggregation per day."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "q_rollup_day_type",
    """
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY ROLLUP(CAST(ts AS DATE), event_type)
    """,
)
def q_rollup_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext — ROLLUP grouping sets."""
    e = _t(spark, sf_dir, "events")
    return e.rollup(F.to_date("ts").alias("day"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


@query(
    "q_revenue_by_flag",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/F5 at fact-table scale (TPC-H Q1 shape) — the bench heavy
    hitter: pushed-down date filter + partial-aggregated groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.to_date("l_shipdate") <= S.date_literal("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# M3 — window / order / limit pack
# ---------------------------------------------------------------------------

@query(
    "q_latest_state",
    """
    SELECT shop, last_event_id, last_ts, last_event_type FROM (
      SELECT user_id AS shop, event_id AS last_event_id, ts AS last_ts,
             event_type AS last_event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — latest-row-per-key (read side of the reference's
    append-as-update storage, src/services/billing.ts:133-163)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("shop"),
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
        )
    )


@query(
    "q_top_shops",
    """
    SELECT user_id AS shop, CAST(COUNT(*) AS BIGINT) AS page_views
    FROM events WHERE event_type = 'view'
    GROUP BY user_id
    ORDER BY page_views DESC, shop ASC
    LIMIT 10
    """,
)
def q_top_shops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/L2 — top-N shops by page views (reference src/services/slack.ts:215-216).
    orderBy+limit compiles to TakeOrderedAndProject — no full sort at scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.where(F.col("event_type") == "view")
        .groupBy(F.col("user_id").alias("shop"))
        .agg(F.count(F.lit(1)).alias("page_views"))
        .orderBy(F.col("page_views").desc(), F.col("shop").asc())
        .limit(10)
    )


@query(
    "q_recent_records",
    """
    SELECT event_id, user_id, event_type, ts
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
    """,
)
def q_recent_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 — ORDER BY DESC LIMIT (reference README monitoring query)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "event_type", "ts")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(10)
    )


@query(
    "q_running_total",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'view' GROUP BY CAST(ts AS DATE)
    )
    SELECT day, n,
           CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS running_total
    FROM daily
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-ext — cumulative sum. The unpartitioned window runs over the
    tiny aggregated daily series (days, not raw events) so the single
    partition is fine at any scale."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.withColumn("running_total", F.sum("n").over(w).cast("long"))


@query(
    "q_lag_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'view' GROUP BY CAST(ts AS DATE)
    )
    SELECT day, n,
           lag(n) OVER (ORDER BY day) AS prev_n,
           n - lag(n) OVER (ORDER BY day) AS delta
    FROM daily
    """,
)
def q_lag_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-ext — day-over-day delta via lag()."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        (F.col("n") - F.lag("n").over(w)).alias("delta"),
    )


@query(
    "q_report_rows",
    f"""
    WITH pv AS (
      SELECT user_id AS shop, CAST(COUNT(*) AS BIGINT) AS page_views
      FROM events
      WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '{TD}'
      GROUP BY user_id
    )
    SELECT shop, page_views,
           format('{{:,}}', page_views) AS page_views_str,
           printf('%.2f', ROUND(page_views / 1000000.0 * 10.0, 2)) AS amount_str
    FROM pv WHERE page_views > 0
    ORDER BY page_views DESC, shop ASC LIMIT 10
    """,
)
def q_report_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/P8/F9/F6 — report rows: filter >0 views, top 10, formatted
    (reference src/services/slack.ts:199-216)."""
    pv = B.pageviews_agg(_t(spark, sf_dir, "events"), TD).withColumnRenamed(
        "event_count", "page_views"
    )
    return (
        pv.where(F.col("page_views") > 0)
        .select(
            "shop",
            "page_views",
            S.grouped_number("page_views").alias("page_views_str"),
            S.money_2dp(S.usage_amount("page_views")).alias("amount_str"),
        )
        .orderBy(F.col("page_views").desc(), F.col("shop").asc())
        .limit(10)
    )
