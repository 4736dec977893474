"""As-of join unit tests: backward semantics, <= at equal timestamps,
tolerance, no-match nulls."""

from __future__ import annotations

import datetime

from pixelspark.ops import asof as AJ

B = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes):
    return B + datetime.timedelta(minutes=minutes)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _m(10), "p1"), (1, _m(30), "p2"), (2, _m(5), "p3")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _m(0), 100), (1, _m(20), 101), (2, _m(50), 102)],
        "user_id long, ts timestamp, rid long",
    )
    out = {
        r["tag"]: (r["asof_rid"], r["asof_ts"])
        for r in AJ.asof_join_backward(
            left, right, "user_id", "ts", "ts", ["rid"]
        ).collect()
    }
    assert out["p1"][0] == 100  # latest right <= 12:10 is 12:00
    assert out["p2"][0] == 101  # latest right <= 12:30 is 12:20
    assert out["p3"][0] is None  # user 2's only right row is later


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, _m(20), "p")], "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _m(20), 7)], "user_id long, ts timestamp, rid long")
    out = AJ.asof_join_backward(left, right, "user_id", "ts", "ts", ["rid"]).collect()
    assert out[0]["asof_rid"] == 7  # <= semantics: equal ts matches


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _m(60), "p")], "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _m(0), 7)], "user_id long, ts timestamp, rid long")
    strict = AJ.asof_join_backward(
        left, right, "user_id", "ts", "ts", ["rid"], tolerance_seconds=600
    ).collect()
    assert strict[0]["asof_rid"] is None  # 60 min gap > 10 min tolerance
    loose = AJ.asof_join_backward(
        left, right, "user_id", "ts", "ts", ["rid"], tolerance_seconds=7200
    ).collect()
    assert loose[0]["asof_rid"] == 7
