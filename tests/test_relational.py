"""Relational helpers: salted aggregation equivalence, sessionization."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixelspark.ops import relational as R
from pixelspark.schemas import load_table


def test_salted_count_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "view")
    plain = {r["user_id"]: r["count"] for r in e.groupBy("user_id").count().collect()}
    salted = {r["shop"]: r["n"] for r in R.salted_count(e, "user_id", out_key="shop").collect()}
    assert salted == plain


def test_salted_sum_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        r["user_id"]: round(r["s"], 6)
        for r in e.groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    salted = {
        r["user_id"]: round(r["total"], 6)
        for r in R.salted_sum(e, "user_id", "value").collect()
    }
    assert salted == plain


def test_sessionize_gaps(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),                                      # session 1
        (1, base + datetime.timedelta(minutes=10)),     # session 1
        (1, base + datetime.timedelta(minutes=50)),     # gap 40m -> session 2
        (2, base),                                      # other user, session 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = R.sessionize(df, gap_minutes=30).collect()
    got = {(r["user_id"], r["ts"].minute): r["session_seq"] for r in out}
    assert got[(1, 0)] == 1 and got[(1, 10)] == 1 and got[(1, 50)] == 2
    assert got[(2, 0)] == 1


def test_salted_join_equals_plain(spark, sf_dir):
    from pixelspark.ops.relational import salted_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    for how in ("inner", "left"):
        got = salted_join(events, cust, "user_id", how)
        want = events.join(cust, "user_id", how)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_salted_join_spreads_hot_key(spark):
    from pixelspark.ops.relational import salted_join

    # one key owns 90% of the big side
    big = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("attr"))
    got = salted_join(big, dim, "k", "left")
    want = big.join(dim, "k", "left")
    assert got.count() == want.count() == 100_000
    assert got.exceptAll(want).count() == 0
