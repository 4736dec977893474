"""Scale evidence harness.

1. Builds a synthetic sf~1 dataset in /tmp by replicating sf0.1 with
   shifted keys (10x lineitem/orders/events), then times the heavy
   queries at sf0.1 vs sf~1 — the ratio shows whether the plans scale
   linearly (they should: one partial-aggregated shuffle each, AQE
   sizing the reduce side).
2. Builds a pathologically skewed events table (one user owns half the
   rows) and times plain vs salted aggregation.

Usage: python tools/scale_probe.py
Prints a JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pixelspark.session import get_spark
from pixelspark import queries as Q

BASE = "/tmp/pixelspark_scale"
SF01 = "/root/testdata/sf0.1"
QUERIES = [
    "q_daily_billing",
    "q_revenue_by_flag",
    "q_star_join",
    "q_latest_state",
    "q_pageviews_agg",
    # round-2b packs: pure-pushdown scan, keyset semi-join, bitmap distinct
    "q_forecast_revenue",
    "q_large_orders",
    "q_bitmap_distinct",
    # round-3: iterative graph op (events-derived edges scale 10x)
    "q_pagerank",
]


def build_sf1(spark) -> str:
    out = os.path.join(BASE, "sf1")
    if os.path.isdir(os.path.join(out, "events.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    for name, key_cols in [
        ("lineitem", {"l_orderkey": 10_000_000}),
        ("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}),
        ("events", {"event_id": 10_000_000, "user_id": 0}),
        ("customer", {"c_custkey": 1_000_000}),
    ]:
        df = spark.read.parquet(f"{SF01}/{name}.parquet")
        copies = []
        for i in range(10):
            c = df
            for col, stride in key_cols.items():
                if stride:
                    c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            copies.append(c)
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    for name in ["nation", "region", "supplier", "part", "documents", "embeddings"]:
        src = f"{SF01}/{name}.parquet"
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            df = spark.read.parquet(src)
            df.write.mode("overwrite").parquet(dst)
    return out


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in QUERIES:
        t0 = time.time()
        Q.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def skew_experiment(spark) -> dict:
    from pixelspark.ops.relational import salted_count

    path = os.path.join(BASE, "skewed_events")
    if not os.path.isdir(path):
        n = 5_000_000
        half = (
            spark.range(n // 2)
            .select(F.lit(0).alias("user_id"), (F.col("id") % 1000).alias("v"))
        )
        rest = (
            spark.range(n // 2)
            .select((F.col("id") % 5000 + 1).alias("user_id"), (F.col("id") % 1000).alias("v"))
        )
        half.unionByName(rest).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    t0 = time.time()
    plain = df.groupBy("user_id").count()
    plain.write.format("noop").mode("overwrite").save()
    t_plain = round(time.time() - t0, 3)
    t0 = time.time()
    salted = salted_count(df, "user_id", count_alias="count")
    salted.write.format("noop").mode("overwrite").save()
    t_salted = round(time.time() - t0, 3)
    a = {r["user_id"]: r["count"] for r in plain.collect()}
    b = {r["user_id"]: r["count"] for r in salted.collect()}
    return {
        "experiment": "skew_5M_one_key_50pct",
        "plain_sec": t_plain,
        "salted_sec": t_salted,
        "results_identical": a == b,
        "hot_key_rows": a.get(0),
    }


def main() -> None:
    spark = get_spark("pixelspark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up
    Q.QUERIES["q_sessions_scan"](spark, SF01).write.format("noop").mode("overwrite").save()

    sf1 = build_sf1(spark)
    # interleave and take best-of-2 per scale to cancel warm-up ordering bias
    t01a = time_queries(spark, SF01)
    t1a = time_queries(spark, sf1)
    t01b = time_queries(spark, SF01)
    t1b = time_queries(spark, sf1)
    t01 = {k: min(t01a[k], t01b[k]) for k in t01a}
    t1 = {k: min(t1a[k], t1b[k]) for k in t1a}
    ratios = {k: round(t1[k] / t01[k], 2) if t01[k] else None for k in t01}
    print(json.dumps({"experiment": "scale_10x", "sf0.1_sec": t01, "sf1_sec": t1,
                      "time_ratio_at_10x_data": ratios}))
    print(json.dumps(skew_experiment(spark)))


if __name__ == "__main__":
    main()
