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


def test_gap_fill_days_ffill(spark, sf_dir):
    from pixelspark.ops.windows import gap_fill_days

    daily = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("shop"), F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    filled = gap_fill_days(daily, "shop", "day", ("n",), fill="ffill")
    # row count == sum over keys of (span days)
    spans = daily.groupBy("shop").agg(
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span")
    )
    want_rows = spans.agg(F.sum("span")).collect()[0][0]
    assert filled.count() == want_rows
    # grid is dense: no shop misses a day inside its span
    assert filled.where(F.col("n").isNull()).count() == 0
    # observed rows keep their original values
    orig = daily.select("shop", "day", F.col("n").alias("orig_n"))
    joined = filled.where("is_observed").join(orig, ["shop", "day"])
    assert joined.where(F.col("n") != F.col("orig_n")).count() == 0
    # and there were real gaps to fill
    assert filled.where(~F.col("is_observed")).count() > 0


def test_approx_quantiles_within_bound(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["q"]
        for r in e.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("q"))
        .collect()
    }
    # GK bounds RANK error, not value error (and approx returns an
    # actual sample while exact interpolates) — so assert each estimate
    # lies between the exact quantiles one percentile point either side
    lo_hi = [(0.49, 0.51), (0.89, 0.91), (0.98, 1.0)]
    bounds = {
        r["event_type"]: r["b"]
        for r in e.groupBy("event_type")
        .agg(
            F.percentile(
                "value",
                F.array(*[F.lit(p) for pair in lo_hi for p in pair]),
            ).alias("b")
        )
        .collect()
    }
    for et, approx in got.items():
        b = bounds[et]
        for i, a in enumerate(approx):
            lo, hi = b[2 * i], b[2 * i + 1]
            assert lo - 1e-9 <= a <= hi + 1e-9, (et, i, a, lo, hi)


def test_scd2_intervals_tile_history(spark, sf_dir):
    """SCD2 invariants: per key, intervals are contiguous (valid_to of
    version k == valid_from of k+1), exactly one is_current, and the
    point-in-time read at any version's start returns that version."""
    from pixelspark.ops.windows import scd2
    from pixelspark.schemas import load_table

    e = load_table(spark, sf_dir, "events")
    log = e.where(F.col("user_id") < 50).select(
        F.col("user_id").alias("shop"), F.col("event_type").alias("status"), "ts"
    )
    hist = scd2(log, keys=("shop",), order_col="ts").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["shop"], []).append(r)
    assert by_key
    for shop, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"]
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]  # contiguous, no gaps
    # point-in-time: status at a middle version's valid_from is that version
    shop, rows = next((s, r) for s, r in by_key.items() if len(r) >= 3)
    probe = rows[1]["valid_from"]
    pit = [
        r
        for r in rows
        if r["valid_from"] <= probe < r["valid_to"]
    ]
    assert len(pit) == 1 and pit[0]["status"] == rows[1]["status"]


def test_snapshot_diff_classifications(spark):
    """Each change class must be detected, including NULL-to-value and
    value-to-NULL updates (null-safe compare) and all-NULL rows that
    exist on only one side (presence markers, not value nulls)."""
    from pixelspark.ops.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (5, None)], "k int, v string"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "updated",
        3: "updated",  # NULL -> 'c'
        4: "deleted",
        5: "inserted",  # present with NULL value: still an insert
    }


def test_hll_sketch_merge_equals_oneshot(spark, sf_dir):
    """HLL register-max merge is order-independent: the union of per-day
    sketches must give the IDENTICAL estimate to one global sketch,
    and both must sit within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from pixelspark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    merged = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("est"))
        .first()["est"]
    )
    oneshot = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est")
    ).first()["est"]
    exact = ev.select("user_id").distinct().count()
    assert merged == oneshot
    assert abs(merged - exact) / exact < 0.05


def test_assign_row_ids_contiguous_and_ordered(spark, sf_dir):
    """Ids must be exactly 0..n-1 with no gaps and must follow the
    order key, across bucket counts that do and don't divide the data
    evenly (including 1 bucket and more buckets than distinct keys)."""
    from pyspark.sql import functions as F

    from pixelspark.ops.relational import assign_row_ids
    from pixelspark.schemas import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").limit(500)
    n = ev.count()
    for parts in (1, 4, 64):
        got = assign_row_ids(ev, ["event_id"], num_partitions=parts)
        rows = got.orderBy("rid").collect()
        assert [r["rid"] for r in rows] == list(range(n))
        ids = [r["event_id"] for r in rows]
        assert ids == sorted(ids)


def test_cdc_apply_latest_wins_and_delete(spark):
    from pixelspark.ops.relational import cdc_apply

    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")], "k long, seq long, v string"
    )
    changelog = spark.createDataFrame(
        [
            (1, 20, "a2", "U"),   # update wins over base
            (2, 20, "xx", "D"),   # delete removes key
            (3, 5, "old", "U"),   # stale change loses to base
            (4, 20, "new", "U"),  # brand-new key inserted
            (4, 30, "new2", "U"), # later change wins within feed
        ],
        "k long, seq long, v string, op string",
    )
    got = {
        r["k"]: (r["seq"], r["v"])
        for r in cdc_apply(base, changelog, keys=["k"], seq=["seq"]).collect()
    }
    assert got == {1: (20, "a2"), 3: (10, "c"), 4: (30, "new2")}


def test_cdc_apply_changelog_beats_base_at_equal_seq(spark):
    from pixelspark.ops.relational import cdc_apply

    base = spark.createDataFrame([(1, 10, "base")], "k long, seq long, v string")
    changelog = spark.createDataFrame(
        [(1, 10, "feed", "U")], "k long, seq long, v string, op string"
    )
    rows = cdc_apply(base, changelog, keys=["k"], seq=["seq"]).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, "feed")]


def test_fuzzy_pairs_segment_filter_is_lossless(spark):
    """The r12 PassJoin-style segment refinement (max_dist=1) must
    return EXACTLY the plain blocked join's pairs: edits at every
    suffix position (either segment), edits inside the prefix (missed
    by BOTH, by blocker design), exact duplicates, empty suffixes
    (name length == block_len), and length-changing edits."""
    from pyspark.sql import functions as F

    from pixelspark.ops.relational import fuzzy_pairs

    rows = [
        (1, "PRE-0000-alpha"),   # pairs with 2 (one suffix sub, seg 1)
        (2, "PRE-0000-alphb"),
        (3, "PRE-0000-aXpha"),   # one sub vs 1, seg 0
        (4, "PRE-0000-alpha"),   # exact dup of 1 (dist 0)
        (5, "PRX-0000-alpha"),   # edit inside prefix: blocked out
        (6, "PRE-0000-alphaa"),  # longer: length mismatch, blocked out
        (7, "PRE-0000-"),        # empty suffix (len == block_len)
        (8, "PRE-0000-"),        # empty-suffix dup: pairs with 7
        (9, "PRE-0000-abpha"),   # 1 sub vs 1 (seg 0), 2 subs vs 3
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    block_len = 9  # "PRE-0000-"

    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in fuzzy_pairs(df, "id", "name", block_len=block_len, max_dist=1).collect()
    }

    # brute-force reference: the plain blocked join semantics
    left = df.select(
        F.col("id").alias("id1"), F.col("name").alias("n1"),
        F.length("name").alias("l1"), F.substring("name", 1, block_len).alias("b1"),
    )
    right = df.select(
        F.col("id").alias("id2"), F.col("name").alias("n2"),
        F.length("name").alias("l2"), F.substring("name", 1, block_len).alias("b2"),
    )
    want = {
        (r["id1"], r["id2"], r["d"])
        for r in left.join(
            right,
            (F.col("b1") == F.col("b2")) & (F.col("l1") == F.col("l2"))
            & (F.col("id1") < F.col("id2")),
        )
        .where(F.levenshtein("n1", "n2") <= 1)
        .select("id1", "id2", F.levenshtein("n1", "n2").cast("int").alias("d"))
        .collect()
    }
    assert got == want
    assert (1, 4, 0) in got and (1, 2, 1) in got and (1, 3, 1) in got
    assert (7, 8, 0) in got
    assert not any(5 in (a, b) or 6 in (a, b) for a, b, _ in got)
