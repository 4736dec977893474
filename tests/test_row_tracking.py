"""Row tracking (Delta row-tracking feature, v1): a system-owned
`__row_id` column assigned by the engine and PRESERVED by every
rewrite — the stable row identity downstream consumers use when no
user key exists.  Built on the identity machinery (`system: true`
spec): absent columns assign whole batches, mixed frames (upsert
unions, merge insert legs) fill only their NULLs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixelspark.table import SnapshotTable


def _ids(t, by="k"):
    return {r[by]: r["__row_id"] for r in t.read().collect()}


def test_assigns_unique_ids_and_survives_compact(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([], "k long, v string"))
    t.enable_row_tracking()
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    ids0 = _ids(t)
    assert sorted(ids0.values()) == [1, 2, 3]  # dense from start=1

    t.compact()  # full rewrite: ids must NOT churn
    assert _ids(t) == ids0
    # and the watermark survives: new rows continue, never reuse
    t.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    ids1 = _ids(t)
    assert ids1[4] == 4 and {ids1[k] for k in (1, 2, 3)} == {1, 2, 3}


def test_upsert_inherits_ids_for_updated_keys(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([], "k long, v string"))
    t.enable_row_tracking()
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    ids0 = _ids(t)

    # update k=1, insert k=9 — source knows nothing about __row_id
    t.upsert(spark.createDataFrame([(1, "a2"), (9, "z")],
                                   "k long, v string"), keys=("k",))
    ids1 = _ids(t)
    assert ids1[1] == ids0[1]  # same logical row, same id
    assert ids1[2] == ids0[2]
    assert ids1[9] not in ids0.values()  # fresh id for the new key
    assert len(set(ids1.values())) == 3  # all distinct
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a2", 2: "b", 9: "z"}


def test_dv_merge_preserves_updated_ids_and_assigns_inserts(
    spark, tmp_path
):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([], "k long, v string"))
    t.enable_row_tracking()
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    ids0 = _ids(t)

    t.merge(
        spark.createDataFrame([(2, "b2"), (7, "n")], "k long, v string"),
        keys=("k",),
        mode="dv",
    )
    ids1 = _ids(t)
    assert ids1[2] == ids0[2]            # post-image carries t.__row_id
    assert ids1[1] == ids0[1] and ids1[3] == ids0[3]
    assert ids1[7] not in ids0.values()  # insert leg filled fresh
    assert len(set(ids1.values())) == 4

    # rewrite-mode merge behaves identically
    t.merge(
        spark.createDataFrame([(3, "c2"), (8, "m")], "k long, v string"),
        keys=("k",),
        mode="rewrite",
    )
    ids2 = _ids(t)
    assert ids2[3] == ids1[3] and ids2[8] not in ids1.values()
    assert len(set(ids2.values())) == 5


def test_update_delete_and_cdf_keep_ids_stable(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([], "k long, v string"))
    t.enable_row_tracking()
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    ids0 = _ids(t)
    v0 = t.latest_version()

    t.update({"v": F.lit("b2")}, condition=F.col("k") == 2, mode="dv")
    t.delete("k = 3", mode="dv")
    ids1 = _ids(t)
    assert ids1 == {1: ids0[1], 2: ids0[2]}  # update kept, delete gone

    # the change feed carries the stable ids — a CDC consumer gets a
    # row identity without a user key
    ch = t.read_changes(v0, keys=("k",))
    by = {(r["k"], r["change_type"]): r["__row_id"] for r in ch.collect()}
    assert by[(2, "updated")] == ids0[2]
    assert by[(3, "deleted")] == ids0[3]


def test_enable_refusals_and_streaming_append_once(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(ValueError, match="backfill"):
        t.enable_row_tracking()  # existing rows: refused (v1)

    t2 = SnapshotTable(spark, str(tmp_path / "t2"),
                       identity={"col": "uid", "start": 1, "step": 1})
    t2.overwrite(spark.createDataFrame([], "k long, v string"))
    with pytest.raises(ValueError, match="identity"):
        t2.enable_row_tracking()  # one watermark slot (v1)

    t3 = SnapshotTable(spark, str(tmp_path / "t3"))
    t3.overwrite(spark.createDataFrame([], "k long, v string"))
    t3.enable_row_tracking()
    # exactly-once ingest: a replayed batch assigns nothing
    t3.append_once(spark.createDataFrame([(1, "a")], "k long, v string"),
                   "app", 1)
    high0 = t3.manifest(t3.latest_version())["identity"]["high"]
    assert t3.append_once(
        spark.createDataFrame([(1, "a")], "k long, v string"), "app", 1
    ) is None
    assert t3.manifest(t3.latest_version())["identity"]["high"] == high0
    assert sorted(_ids(t3).values()) == [1]


def test_upsert_id_inheritance_survives_duplicate_existing_rows(
    spark, tmp_path
):
    """ADVICE r7: append can stack several rows per business key; the
    upsert id-inheritance join must not fan the source out (one
    source row -> one rewritten row, inheriting ONE of the key's
    ids), and a source with duplicate keys is refused — two rows
    sharing one __row_id would break row-id uniqueness."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([], "k long, v string"))
    t.enable_row_tracking()
    # two physical rows for k=1 (append is not keyed)
    t.append(spark.createDataFrame([(1, "a"), (1, "a2"), (2, "b")],
                                   "k long, v string"))

    t.upsert(spark.createDataFrame([(1, "a3")], "k long, v string"),
             keys=("k",))
    rows = t.read().collect()
    assert sorted(r["k"] for r in rows) == [1, 2]  # no fan-out
    ids = {r["k"]: r["__row_id"] for r in rows}
    assert ids[1] in (1, 2)  # inherited the key's min id, not both
    assert len(set(ids.values())) == 2

    with pytest.raises(ValueError, match="key-unique"):
        t.upsert(spark.createDataFrame([(3, "x"), (3, "y")],
                                       "k long, v string"), keys=("k",))
