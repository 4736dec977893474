"""Incremental materialized aggregate views (ops/matview.py): CDF
pre/post images fold into COUNT/SUM state by exact retraction, the
refresh is idempotent via the merge txn watermark, and after EVERY
refresh the view equals the from-scratch aggregate of the source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixelspark.ops import matview as MV
from pixelspark.table import SnapshotTable


@pytest.fixture()
def pair(spark, tmp_path):
    src = SnapshotTable(spark, str(tmp_path / "src"))
    view = SnapshotTable(spark, str(tmp_path / "view"))
    return src, view


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "k long, status string, views long, amt double"
    )


def _recompute(src):
    return src.read().groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("views").cast("long").alias("views"),
        F.sum(F.col("amt").cast(MV._SUM_T)).alias("amt"),
    )


def _assert_view_exact(src, view):
    got = sorted(map(tuple, view.read().select(
        "status", "n", "views", "amt").collect()))
    want = sorted(map(tuple, _recompute(src).collect()))
    assert got == want


def _refresh(src, view):
    return MV.refresh_agg_view(
        src, view, group_by=("status",), sum_cols=("views", "amt"),
        src_keys=("k",),
    )


def test_view_tracks_source_through_mixed_history(spark, pair):
    src, view = pair
    src.overwrite(_rows(spark, [
        (1, "active", 10, 1.5), (2, "active", 20, 2.5),
        (3, "frozen", 5, 0.25),
    ]))
    assert _refresh(src, view) is not None
    _assert_view_exact(src, view)

    # updates move a row across groups AND change summed values
    src.merge(_rows(spark, [(2, "frozen", 25, 3.0), (4, "new", 7, 0.5)]),
              keys=("k",))
    assert _refresh(src, view) is not None
    _assert_view_exact(src, view)

    # merge-on-read delete (deletion vectors in the CDF window)
    src.delete(F.col("k") == 1, mode="dv")
    assert _refresh(src, view) is not None
    _assert_view_exact(src, view)

    # nothing new: refresh is a no-op
    assert _refresh(src, view) is None


def test_emptied_groups_leave_no_ghost_rows(spark, pair):
    src, view = pair
    src.overwrite(_rows(spark, [
        (1, "a", 10, 0.1), (2, "a", 20, 0.2), (3, "b", 1, 1.0),
    ]))
    _refresh(src, view)
    src.delete("status = 'a'")
    _refresh(src, view)
    assert [r["status"] for r in view.read().collect()] == ["b"]
    _assert_view_exact(src, view)


def test_float_retraction_is_exact(spark, pair):
    """0.1-style values fold in DECIMAL: inserting then deleting the
    same rows nets to exactly zero (group fully removed), with no
    float residue keeping a ghost row alive."""
    src, view = pair
    src.overwrite(_rows(spark, [(i, "x", 1, 0.1) for i in range(7)]))
    _refresh(src, view)
    src.delete("status = 'x'")
    _refresh(src, view)
    assert view.read().isEmpty()


def test_refresh_folds_multiple_source_commits_at_once(spark, pair):
    src, view = pair
    src.overwrite(_rows(spark, [(1, "a", 1, 1.0)]))
    src.upsert(_rows(spark, [(2, "a", 2, 2.0)]), keys=("k",))
    src.upsert(_rows(spark, [(1, "b", 3, 3.0)]), keys=("k",))
    _refresh(src, view)  # one refresh spans three source versions
    _assert_view_exact(src, view)
    assert MV.last_folded_version(src, view) == src.latest_version()


def test_replayed_refresh_commits_nothing(spark, pair):
    """Crash-retry shape: the fold merge replayed with the same
    (app_id, source_version) is rejected by the txn watermark."""
    src, view = pair
    src.overwrite(_rows(spark, [(1, "a", 1, 1.0)]))
    _refresh(src, view)
    v_after = view.latest_version()
    replay = view.merge(
        spark.createDataFrame([("a", 5, 5, 5.0)],
                              "status string, n long, views long, amt double"),
        keys=("status",),
        txn=(MV._app_id(src, view), src.latest_version()),
    )
    assert replay is None
    assert view.latest_version() == v_after
    _assert_view_exact(src, view)


def test_dv_merge_mode_fold(spark, pair):
    src, view = pair
    src.overwrite(_rows(spark, [
        (1, "a", 10, 1.0), (2, "b", 20, 2.0),
    ]))
    MV.refresh_agg_view(src, view, group_by=("status",),
                        sum_cols=("views", "amt"), src_keys=("k",),
                        merge_mode="dv")
    src.merge(_rows(spark, [(2, "b", 30, 2.5)]), keys=("k",))
    MV.refresh_agg_view(src, view, group_by=("status",),
                        sum_cols=("views", "amt"), src_keys=("k",),
                        merge_mode="dv")
    _assert_view_exact(src, view)


def test_with_avg_derives_from_exact_pairs(spark, pair):
    src, view = pair
    src.overwrite(_rows(spark, [
        (1, "a", 10, 1.0), (2, "a", 30, 3.0),
    ]))
    _refresh(src, view)
    row = MV.with_avg(view.read(), ("views",)).collect()[0]
    assert float(row["avg_views"]) == 20.0
