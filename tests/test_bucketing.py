"""Bucketed-table co-location: a join between two tables bucketed on
the join key must not shuffle either side."""

from __future__ import annotations

import contextlib
import io as _io

from pyspark.sql import functions as F

from pixelspark import io as pio
from pixelspark.schemas import load_table


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    pio.write_bucketed_table(events, "b_events", "user_id", num_buckets=8)
    pio.write_bucketed_table(
        customer.withColumnRenamed("c_custkey", "user_id"), "b_customer", "user_id", num_buckets=8
    )
    try:
        be = spark.table("b_events")
        bc = spark.table("b_customer")
        # disable broadcast so the co-location (not broadcasting) is what
        # removes the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = be.join(bc, "user_id")
            plan = _plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # no shuffle on either side
            # sanity: result is correct
            assert joined.count() == be.count()  # every event's user exists
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_analyze_table_feeds_cbo_stats(spark, sf_dir, tmp_path):
    """ANALYZE TABLE statistics must reach the optimizer: after
    COMPUTE STATISTICS the logical plan carries real rowCount/sizeInBytes
    for the table — what cost-based join reordering and broadcast
    decisions consume when file-size heuristics are unavailable or
    wrong (e.g. highly compressed or wide-but-filtered tables)."""
    from pixelspark.schemas import load_table

    load_table(spark, sf_dir, "supplier").write.mode("overwrite").saveAsTable("supplier_cbo")
    saved = spark.conf.get("spark.sql.cbo.enabled")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.sql("ANALYZE TABLE supplier_cbo COMPUTE STATISTICS")
        stats = (
            spark.table("supplier_cbo")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        n = spark.table("supplier_cbo").count()
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == n
        assert stats.sizeInBytes() > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved)
        spark.sql("DROP TABLE IF EXISTS supplier_cbo")
