"""External charge sink (S8): retry/backoff, zero-amount skip,
bounded concurrency partitioning, idempotency under task replay —
mirrors src/test/shopifyBilling.test.ts and adds the at-least-once
hazard the reference never faces."""

from __future__ import annotations

from pyspark.sql import types as T

from pixelspark.ops import external as X


def test_charge_with_retry_backoff():
    attempts = []
    delays = []

    def flaky(shop, amount):
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("429 too many requests")
        return "gid://charge/1"

    status, cid, err, n = X.charge_with_retry(
        flaky, 1, 5.0, max_retries=3, base_delay=1.0, sleep=delays.append
    )
    assert (status, cid, n) == ("success", "gid://charge/1", 3)
    assert delays == [1.0, 2.0]  # 1s * 2^(n-1) — shopifyBilling.ts:123-129


def test_charge_with_retry_exhaustion():
    def always_fail(shop, amount):
        raise RuntimeError("boom")

    status, cid, err, n = X.charge_with_retry(
        always_fail, 1, 5.0, max_retries=3, base_delay=0.0, sleep=lambda _d: None
    )
    assert (status, cid, n) == ("failed", None, 3)
    assert "boom" in err


PLAN_SCHEMA = T.StructType(
    [
        T.StructField("shop", T.LongType(), False),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def _plan(spark, rows):
    return spark.createDataFrame(rows, PLAN_SCHEMA)


def test_charge_shops_skip_and_success(spark, tmp_path):
    plan = _plan(spark, [(1, 5.0, "pending"), (2, 0.0, "skipped"), (3, -1.0, "skipped")])
    res = X.charge_shops(
        plan, "2024-01-02", lambda s, a: f"gid://charge/{s}",
        ledger_dir=str(tmp_path / "ledger"), base_delay=0.0,
    )
    got = {r["shop"]: r for r in res.collect()}
    assert got[1]["status"] == "success" and got[1]["charge_id"] == "gid://charge/1"
    assert got[2]["status"] == "skipped" and got[2]["charge_id"] is None
    assert got[3]["status"] == "skipped"


def test_idempotency_no_double_charge(spark, tmp_path):
    """Replaying the charge stage (Spark task retry / job rerun) must
    not charge the same (shop, billing_date) twice."""
    ledger = str(tmp_path / "ledger")
    plan = _plan(spark, [(1, 5.0, "pending"), (2, 7.0, "pending")])
    calls = []

    def charge(shop, amount):
        calls.append(shop)
        return f"gid://charge/{shop}"

    first = X.charge_shops(plan, "2024-01-02", charge, ledger_dir=ledger, base_delay=0.0)
    assert {r["status"] for r in first.collect()} == {"success"}
    # replay: same plan, same ledger -> all duplicates, no external calls
    second = X.charge_shops(plan, "2024-01-02", charge, ledger_dir=ledger, base_delay=0.0)
    assert {r["status"] for r in second.collect()} == {"duplicate"}
    # a DIFFERENT billing date is a fresh charge
    third = X.charge_shops(plan, "2024-01-03", charge, ledger_dir=ledger, base_delay=0.0)
    assert {r["status"] for r in third.collect()} == {"success"}


def test_concurrency_bound_partitioning(spark, tmp_path):
    plan = _plan(spark, [(i, 1.0, "pending") for i in range(50)])
    bounded = plan.select("shop", "amount", "status").repartition(5, "shop")
    assert bounded.rdd.getNumPartitions() == 5  # <=5 in flight, p-limit(5) parity


def test_enrich_with_results(spark, tmp_path):
    from pyspark.sql import functions as F

    plan = _plan(spark, [(1, 5.0, "pending"), (2, 0.0, "skipped")])
    res = X.charge_shops(
        plan, "2024-01-02", lambda s, a: f"gid://c/{s}",
        ledger_dir=str(tmp_path / "ledger"), base_delay=0.0,
    )
    records = plan.select("shop", "amount")
    enriched = X.enrich_with_results(records, res)
    got = {r["shop"]: r["shopify_billing_status"] for r in enriched.collect()}
    assert got == {1: "success", 2: "skipped"}
