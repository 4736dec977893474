"""Physical-plan regression tests: the scale properties we rely on must
stay visible in explain output (pushdown, broadcast, no sort-merge for
dim joins)."""

from __future__ import annotations

import contextlib
import io


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_day_filter_pushes_to_scan(spark, sf_dir):
    from pixelspark.ops.billing import daily_billing
    from pixelspark.schemas import load_table

    plan = _plan(
        daily_billing(
            load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "events"), "2024-01-02"
        )
    )
    # the day range must reach the parquet scan as int64 bounds
    assert "GreaterThanOrEqual(ts," in plan and "LessThan(ts," in plan
    assert "EqualTo(event_type,view)" in plan


def test_star_join_all_broadcast(spark, sf_dir):
    from pixelspark.queries import QUERIES

    plan = _plan(QUERIES["q_star_join"](spark, sf_dir))
    assert "SortMergeJoin" not in plan  # every dim side broadcasts


def test_column_pruning(spark, sf_dir):
    from pixelspark.queries import QUERIES

    plan = _plan(QUERIES["q_pageviews_agg"](spark, sf_dir))
    # only the three needed columns are read from the events scan
    assert "event_id" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    from pixelspark.queries import QUERIES

    plan = _plan(QUERIES["q_contamination"](spark, sf_dir))
    # benchmark gram set joins broadcast; the training-gram scan never
    # shuffles into a sort-merge join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_correlated_exists_becomes_semi_join(spark, sf_dir):
    from pixelspark.queries import QUERIES

    plan = _plan(QUERIES["q_correlated_exists"](spark, sf_dir))
    assert "LeftSemi" in plan
    # the totalprice predicate reaches the orders scan
    assert "o_totalprice" in plan and "PushedFilters" in plan


def test_repetition_is_narrow(spark, sf_dir):
    from pixelspark.ops.llm import ngram_repetition
    from pixelspark.schemas import load_table

    plan = _plan(ngram_repetition(load_table(spark, sf_dir, "documents")))
    # per-row array math: no exchange of any kind
    assert "Exchange" not in plan


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: joining a day-partitioned fact on its partition column with
    a filtered dim must prune fact partitions at RUNTIME from the dim's
    build side — at 100 TB this is the difference between scanning one
    day and scanning the table when the day list isn't a literal."""
    from pyspark.sql import functions as F

    from pixelspark import io as pio
    from pixelspark.schemas import load_table

    events = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_dpp")
    pio.write_partitioned(events, path, ("day",))
    fact = pio.read_partitioned(spark, path)
    dim = events.select("day").distinct().where(F.dayofmonth("day") == 5)
    joined = fact.join(F.broadcast(dim), "day").groupBy("day").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan
    want = (
        events.where(F.dayofmonth(F.to_date("ts")) == 5)
        .groupBy(F.to_date("ts").alias("day"))
        .count()
    )
    assert joined.exceptAll(want).count() == 0 and want.exceptAll(joined).count() == 0


def test_runtime_bloom_filter_join(spark, sf_dir):
    """Runtime row-level filtering: a selective predicate on the dim
    side of a shuffle join builds a Bloom filter that is pushed into
    the fact scan — at 100 TB this drops most fact rows before the
    shuffle instead of after the join.  (Thresholds lowered because the
    production defaults — 10 GB application-side scan — are sized for
    real clusters, not test fixtures.)"""
    from pyspark.sql import functions as F

    from pixelspark.schemas import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan  # BloomFilterMightContain on the fact side
        got = j.collect()
        assert len(got) == 1 and got[0]["o_orderpriority"] == "1-URGENT"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_curate_corpus_single_shuffle(spark, sf_dir):
    """The composed curation chain must stay one hash exchange (the
    dedup groupBy) — quality/redact/chunk/split are narrow stages and
    must not introduce extra shuffles."""
    import re

    from pixelspark.ops.llm import curate_corpus
    from pixelspark.schemas import load_table

    plan = (
        curate_corpus(load_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "SortMergeJoin" not in plan


def test_join_strategy_hints(spark, sf_dir):
    """Hints are the manual override when stats mislead the planner:
    BROADCAST must force a broadcast join on a side the threshold
    would reject, MERGE must force sort-merge where broadcast would
    win.  Values must be identical either way."""
    from pyspark.sql import functions as F

    from pixelspark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    merged = orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
    assert "SortMergeJoin" in merged._jdf.queryExecution().executedPlan().toString()

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert "BroadcastHashJoin" not in plain._jdf.queryExecution().executedPlan().toString()
        hinted = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        assert "BroadcastHashJoin" in hinted._jdf.queryExecution().executedPlan().toString()
        assert hinted.count() == plain.count() == merged.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """AQE must shrink the configured 8 shuffle partitions down to the
    few the data actually needs — the runtime re-plan that keeps a
    fixed spark.sql.shuffle.partitions setting from fragmenting small
    aggregates into thousands of empty tasks at any scale."""
    from pyspark.sql import functions as F

    from pixelspark.schemas import load_table

    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg.collect()  # materialize so AQE finalizes the plan
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_forecast_revenue_full_pushdown(spark, sf_dir):
    """TPC-H Q6 is a pure scan query: every predicate (date range,
    discount band, quantity cap) must reach the parquet scan so row
    groups outside the bands are skipped via min/max stats."""
    from pixelspark.queries import QUERIES

    plan = _plan(QUERIES["q_forecast_revenue"](spark, sf_dir))
    for frag in (
        "GreaterThanOrEqual(l_shipdate,",
        "LessThan(l_shipdate,",
        "GreaterThanOrEqual(l_discount,0.04)",
        "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in plan, frag
    # only the four referenced columns are read
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>" in plan


def test_volume_shipping_dims_broadcast(spark, sf_dir):
    """Q7 joins nation twice under two roles plus customer/supplier —
    all four dim joins must broadcast; the only SortMergeJoin (if any)
    is the lineitem->orders fact join."""
    from pixelspark.queries import QUERIES

    plan = _plan(QUERIES["q_volume_shipping"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4


def test_bitmap_distinct_two_level_shape(spark, sf_dir):
    """bitmap_distinct must build bitmaps map-side: partial
    HashAggregate below the Exchange, final above — the payload of the
    wide shuffle is fixed-width bitmaps, not raw (group, id) rows."""
    from pixelspark.ops.sketches import bitmap_distinct
    from pixelspark.schemas import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    plan = _plan(bitmap_distinct(ev, ["event_type"], "user_id"))
    assert plan.count("HashAggregate") >= 4  # partial+final x two levels
    assert "bitmap_construct_agg" in plan


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE skew-join handling: a sort-merge join where one key owns
    90% of the fact side must show the skewed partition SPLIT in the
    final adaptive plan (SortMergeJoin(skew=true), AQEShuffleRead
    ... skewed) — the runtime counterpart to the manual salted join in
    ops/relational.py, and the reason a 100-TB join survives a hot
    tenant without hand-salting.  Values are unaffected by the split."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 200_000
        hot = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = hot.join(dim, "k")
        rows = joined.collect()  # materialize THIS plan so AQE finalizes it
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # the AQEShuffleRead marker
        # values unaffected by the split: hot key matches dim k=7 once,
        # non-hot ids < 2000 match once each
        expected = hot.where(F.col("k") == 7).count() + hot.where(
            (F.col("k") != 7) & (F.col("k") < 2_000)
        ).count()
        assert len(rows) == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
