"""Seeded randomized DML lifecycles for the whole view family: a
pseudo-random sequence of append / merge / delete / DV-delete /
overwrite ops, with EVERY view flavor (fold, minmax-recompute, top-N)
refreshed and compared against its from-scratch aggregate after each
step.  Deterministic seeds — failures replay exactly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pixelspark.ops import matview as MV
from pixelspark.table import SnapshotTable

# SLOW TIER (r13): the randomized view-family DML lifecycles —
# certification-depth work excluded from the default fast tier
# (pytest.ini); run with -m slow, or -m "" for the whole suite.
pytestmark = pytest.mark.slow

STATUSES = ["a", "b", "c", None]


def _batch(spark, rng, keys):
    rows = [
        (k, rng.choice(STATUSES), rng.randrange(0, 100),
         round(rng.uniform(0, 9), 2))
        for k in keys
    ]
    return spark.createDataFrame(
        rows, "k long, status string, views long, amt double")


def _check_all(spark, src, agg, mm, top):
    key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    base = src.read()

    got = sorted(map(tuple, agg.read().select(
        "status", "n", "views").collect()), key=key)
    want = sorted(map(tuple, base.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("views").cast("long").alias("views")).collect()), key=key)
    assert got == want, "agg view diverged"

    got = sorted(map(tuple, mm.read().select(
        "status", "n", "min_views", "max_views").collect()), key=key)
    want = sorted(map(tuple, base.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("views").alias("min_views"),
        F.max("views").alias("max_views")).collect()), key=key)
    assert got == want, "minmax view diverged"

    w = Window.partitionBy("status").orderBy(
        F.col("views").desc(), F.col("k").asc())
    got = sorted(map(tuple, top.read().select(
        "status", "rank", "views", "k").collect()), key=key)
    want = sorted(map(tuple, base.withColumn(
        "rank", F.row_number().over(w)).where(F.col("rank") <= 2)
        .select("status", "rank", "views", "k").collect()), key=key)
    assert got == want, "topn view diverged"


@pytest.mark.parametrize("seed", [7, 23])
def test_view_family_random_dml_lifecycle(spark, tmp_path, seed):
    rng = random.Random(seed)
    src = SnapshotTable(spark, str(tmp_path / "src"))
    agg = SnapshotTable(spark, str(tmp_path / "agg"))
    mm = SnapshotTable(spark, str(tmp_path / "mm"))
    top = SnapshotTable(spark, str(tmp_path / "top"))

    def refresh_all():
        MV.refresh_agg_view(src, agg, group_by=("status",),
                            sum_cols=("views",), src_keys=("k",))
        MV.refresh_minmax_view(src, mm, group_by=("status",),
                               min_cols=("views",), max_cols=("views",),
                               src_keys=("k",))
        MV.refresh_topn_view(src, top, group_by=("status",),
                             order_by=("views", "k"),
                             descending=(True, False), n=2,
                             src_keys=("k",))

    next_key = [0]

    def fresh_keys(n):
        ks = list(range(next_key[0], next_key[0] + n))
        next_key[0] += n
        return ks

    def live_keys():
        return [r["k"] for r in src.read().select("k").collect()]

    src.overwrite(_batch(spark, rng, fresh_keys(8)))
    refresh_all()
    _check_all(spark, src, agg, mm, top)

    for step in range(10):
        op = rng.choice(["append", "merge", "delete", "dv_delete",
                         "overwrite_some"])
        live = live_keys()
        if op == "append":
            src.append(_batch(spark, rng, fresh_keys(rng.randrange(1, 5))))
        elif op == "merge" and live:
            picks = rng.sample(live, min(len(live), 3))
            src.merge(_batch(spark, rng, picks + fresh_keys(1)),
                      keys=("k",))
        elif op == "delete" and live:
            m = rng.choice([2, 3, 5])
            src.delete(f"k % {m} = {rng.randrange(m)}")
        elif op == "dv_delete" and live:
            src.delete(F.col("k").isin(
                rng.sample(live, min(len(live), 2))), mode="dv")
        else:
            src.overwrite(_batch(spark, rng, (live or fresh_keys(2))[:6]))
        refresh_all()
        _check_all(spark, src, agg, mm, top)

    # the settled family no-ops
    assert MV.refresh_agg_view(src, agg, group_by=("status",),
                               sum_cols=("views",), src_keys=("k",)) is None
