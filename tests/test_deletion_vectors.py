"""Deletion-vector (merge-on-read delete) tests: read-time masking,
equivalence with the copy-on-write rewrite, composition of multiple
vectors, time travel, compact materialization, vacuum liveness, CDF
over DV versions, and interplay with append/upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixelspark.table import SnapshotTable


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.overwrite(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "k long, v string"
        )
    )
    return t


def test_dv_delete_masks_rows_without_rewriting(spark, table):
    entries_before = table.manifest(table.latest_version())["entries"]
    v = table.delete(F.col("k") >= 7, mode="dv")
    m = table.manifest(v)
    assert m["entries"] == entries_before  # zero data rewritten
    assert len(m.get("dv_files", [])) == 1
    assert _rows(table.read()) == [(i, f"v{i}") for i in range(7)]


def test_dv_delete_equals_rewrite_delete(spark, tmp_path):
    data = [(i, f"v{i}") for i in range(20)]
    a = SnapshotTable(spark, str(tmp_path / "a"))
    b = SnapshotTable(spark, str(tmp_path / "b"))
    for t in (a, b):
        t.overwrite(spark.createDataFrame(data, "k long, v string"))
    a.delete("k % 3 = 0", mode="dv")
    b.delete("k % 3 = 0", mode="rewrite")
    assert _rows(a.read()) == _rows(b.read())


def test_dv_deletes_compose(spark, table):
    table.delete("k >= 8", mode="dv")
    v = table.delete("k < 2", mode="dv")
    assert len(table.manifest(v)["dv_files"]) == 2
    assert _rows(table.read()) == [(i, f"v{i}") for i in range(2, 8)]
    # deleting already-deleted rows is a no-op commit
    assert table.delete("k >= 8", mode="dv") == v
    assert table.latest_version() == v


def test_dv_time_travel_sees_predelete_rows(spark, table):
    v0 = table.latest_version()
    table.delete("k = 0", mode="dv")
    assert len(_rows(table.read(version=v0))) == 10
    assert len(_rows(table.read())) == 9


def test_compact_materializes_and_retires_dvs(spark, table):
    table.delete("k >= 5", mode="dv")
    v = table.compact()
    m = table.manifest(v)
    assert not m.get("dv_files")
    assert _rows(table.read()) == [(i, f"v{i}") for i in range(5)]
    # the vector dir (and the masked bytes) are now vacuum-able
    removed = table.vacuum(keep_versions=1)
    assert any("__dv=" in p for p in removed)
    assert _rows(table.read()) == [(i, f"v{i}") for i in range(5)]


def test_vacuum_keeps_live_dv_dirs(spark, table):
    table.delete("k = 3", mode="dv")
    removed = table.vacuum(keep_versions=1)
    assert not any("__dv=" in p for p in removed)
    assert len(_rows(table.read())) == 9


def test_append_after_dv_delete_keeps_mask(spark, table):
    table.delete("k < 5", mode="dv")
    table.append(
        spark.createDataFrame([(100, "v100")], "k long, v string")
    )
    got = _rows(table.read())
    assert (100, "v100") in got
    assert all(k >= 5 for k, _ in got)
    assert table.manifest(table.latest_version()).get("dv_files")


def test_upsert_after_dv_delete_does_not_resurrect(spark, table):
    table.delete("k = 4", mode="dv")
    table.upsert(
        spark.createDataFrame([(5, "v5b")], "k long, v string"), keys=("k",)
    )
    got = dict(_rows(table.read()))
    assert 4 not in got and got[5] == "v5b" and len(got) == 9
    # the upsert's full rewrite materialized the mask
    assert not table.manifest(table.latest_version()).get("dv_files")


def test_dv_on_partitioned_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", f"v{i}") for i in range(12)],
        "k long, day string, v string",
    )
    t.replace_partitions(df, "day")
    t.delete("k = 7", mode="dv")
    got = [r["k"] for r in t.read().collect()]
    assert sorted(got) == [i for i in range(12) if i != 7]
    # partition-pruned reads mask too
    d1 = [r["k"] for r in t.read(partition_values=["d1"]).collect()]
    assert sorted(d1) == [1, 4, 10]


def test_read_changes_sees_dv_deletes(spark, table):
    v0 = table.latest_version()
    table.delete("k >= 8", mode="dv")
    ch = table.read_changes(v0, keys=("k",)).collect()
    got = {(r["k"], r["change_type"]) for r in ch}
    assert got == {(8, "deleted"), (9, "deleted")}
    # no-change window over an unchanged DV set is empty
    v1 = table.latest_version()
    assert table.read_changes(v1, v1, keys=("k",)).count() == 0


def test_read_changes_pure_append_on_dv_table_stays_keyless(spark, table):
    """A pure append on a DV-bearing table (dv sets identical, no
    entry removed) keeps the insert-only fast path: no `keys`
    required, and only the appended dirs are read — vectors address
    pre-existing files only, so new dirs can never be masked."""
    table.delete("k = 3", mode="dv")
    v1 = table.latest_version()
    table.append(spark.createDataFrame([(100, "x")], "k long, v string"))
    ch = table.read_changes(v1).collect()  # keyless — was ValueError
    assert {(r["k"], r["change_type"]) for r in ch} == {(100, "inserted")}
    # a window where the DV set changed still demands keys
    with pytest.raises(ValueError, match="deletion"):
        table.read_changes(v1 - 1)


def test_dv_only_merge_leaves_no_empty_data_dir(spark, table):
    """A MERGE whose only effect is deletion (DV written, zero
    post-images/inserts) must not leave an empty __snap= dir behind."""
    snaps_before = {p for p in table.st.list(f"{table.root}/data")
                    if p.startswith("__snap=")}
    src = spark.createDataFrame([(2, "dead")], "k long, v string")
    table.merge(src, keys=("k",), when_matched_update=None,
                when_matched_delete="true", when_not_matched_insert=False,
                mode="dv")
    assert sorted(k for k, _ in _rows(table.read())) == [
        i for i in range(10) if i != 2
    ]
    snaps_after = {p for p in table.st.list(f"{table.root}/data")
                   if p.startswith("__snap=")}
    assert snaps_after == snaps_before  # vector committed, no data dir


def test_restore_returns_dv_state(spark, table):
    table.delete("k = 0", mode="dv")
    v_dv = table.latest_version()
    table.delete("k = 1", mode="dv")
    table.restore(v_dv)
    got = [k for k, _ in _rows(table.read())]
    assert got == list(range(1, 10))  # k=0 gone, k=1 back


def test_dv_delete_nothing_matched_is_noop(spark, table):
    v = table.latest_version()
    assert table.delete("k > 1000", mode="dv") == v
    assert table.latest_version() == v


def test_vacuum_collects_orphaned_dv_dir(spark, table):
    """A crash between the DV parquet write and the manifest commit
    leaves an unreferenced __dv= dir — vacuum must collect it like any
    other crash leftover, without touching live vectors."""
    table.delete("k = 9", mode="dv")  # live vector
    orphan = f"{table.root}/data/__dv=deadbeefcafe0000"
    spark.createDataFrame(
        [("data/__snap=nope/part-0.parquet", 0)], "__dv_file string, __dv_row long"
    ).write.parquet(orphan)
    removed = table.vacuum(keep_versions=1)
    assert any("__dv=deadbeefcafe0000" in p for p in removed)
    live = table.manifest(table.latest_version())["dv_files"]
    assert all(table.st.exists(f"{table.root}/{d}") for d in live)
    assert len(_rows(table.read())) == 9


def test_dv_update_equals_rewrite_update(spark, tmp_path):
    data = [(i, f"d{i % 3}", i * 10) for i in range(12)]
    a = SnapshotTable(spark, str(tmp_path / "ua"))
    b = SnapshotTable(spark, str(tmp_path / "ub"))
    for t in (a, b):
        t.replace_partitions(
            spark.createDataFrame(data, "k long, day string, x long"), "day"
        )
    a.update({"x": "x + 1"}, condition="k % 4 = 0", mode="dv")
    b.update({"x": "x + 1"}, condition="k % 4 = 0", mode="rewrite")
    ra = sorted((r["k"], r["day"], r["x"]) for r in a.read().collect())
    rb = sorted((r["k"], r["day"], r["x"]) for r in b.read().collect())
    assert ra == rb
    # no pre-existing partition data was rewritten: every original
    # entry survives; the commit ADDED one entry + one vector
    m = a.manifest(a.latest_version())
    assert len(m["entries"]) == 2 and len(m["dv_files"]) == 1


def test_dv_update_can_move_partitions(spark, tmp_path):
    """mode='dv' may assign the partition column — the updated copy is
    ordinary appended data, so the row just moves lists (the rewrite
    mode must refuse this)."""
    t = SnapshotTable(spark, str(tmp_path / "mv"))
    t.replace_partitions(
        spark.createDataFrame(
            [(1, "d0", 1), (2, "d1", 2)], "k long, day string, x long"
        ),
        "day",
    )
    with pytest.raises(ValueError, match="partition column"):
        t.update({"day": F.lit("d9")}, condition="k = 1", mode="rewrite")
    t.update({"day": F.lit("d9")}, condition="k = 1", mode="dv")
    got = {r["k"]: r["day"] for r in t.read().collect()}
    assert got == {1: "d9", 2: "d1"}
    d9 = [r["k"] for r in t.read(partition_values=["d9"]).collect()]
    assert d9 == [1]


def test_dv_update_nothing_matched_is_noop(spark, table):
    v = table.latest_version()
    assert table.update({"v": F.lit("zz")}, condition="k > 99", mode="dv") == v
    assert table.latest_version() == v


def test_dv_merge_equals_rewrite_merge(spark, tmp_path):
    """mode='dv' MERGE must produce the same end state as the rewrite
    merge across all three clauses (update / delete / insert), while
    keeping every pre-existing data entry untouched."""
    data = [(i, f"v{i}", i * 10) for i in range(10)]
    src = [(5, "v5new", 0), (8, "v8new", 0), (100, "v100", 1000)]
    a = SnapshotTable(spark, str(tmp_path / "ma"))
    b = SnapshotTable(spark, str(tmp_path / "mb"))
    for t in (a, b):
        t.overwrite(spark.createDataFrame(data, "k long, v string, x long"))
    source = spark.createDataFrame(src, "k long, v string, x long")
    for t, mode in ((a, "dv"), (b, "rewrite")):
        t.merge(
            source, keys=("k",),
            when_matched_delete="t.k = 8",
            when_matched_update="all",
            when_not_matched_insert=True,
            mode=mode,
        )
    ra = sorted((r["k"], r["v"], r["x"]) for r in a.read().collect())
    rb = sorted((r["k"], r["v"], r["x"]) for r in b.read().collect())
    assert ra == rb
    assert (5, "v5new", 0) in ra and (100, "v100", 1000) in ra
    assert not any(k == 8 for k, _, _ in ra)
    m = a.manifest(a.latest_version())
    assert len(m["entries"]) == 2 and len(m["dv_files"]) == 1


def test_dv_merge_insert_only_and_noop(spark, table):
    """A source with no matches inserts without writing a vector; a
    fully-no-op merge (no matches, insert condition false) commits
    nothing."""
    v0 = table.latest_version()
    source = table.spark.createDataFrame(
        [(50, "v50")], "k long, v string"
    )
    table.merge(source, keys=("k",), mode="dv")
    m = table.manifest(table.latest_version())
    assert not m.get("dv_files")
    assert dict(_rows(table.read()))[50] == "v50"
    v1 = table.latest_version()
    assert table.merge(
        source.where("k > 999"), keys=("k",), mode="dv"
    ) == v1
    assert table.latest_version() == v1


def test_dv_merge_after_dv_delete_does_not_resurrect(spark, table):
    """A key removed by a DV delete counts as absent: merging it again
    INSERTS a fresh row (it does not un-mask the old one)."""
    table.delete("k = 3", mode="dv")
    table.merge(
        table.spark.createDataFrame([(3, "v3new")], "k long, v string"),
        keys=("k",),
        mode="dv",
    )
    got = dict(_rows(table.read()))
    assert got[3] == "v3new" and len(got) == 10


def test_dv_metrics_report_debt_and_detail_carries_them(spark, tmp_path):
    """dv_metrics / detail(): masked rows + vector bytes from parquet
    FOOTERS only (no data pages), masked fraction against the
    manifest's recorded pre-mask counts; zeroed after compact()
    materializes the masks."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k long, v string"))
    assert t.dv_metrics() == {
        "dv_masked_rows": 0, "dv_bytes": 0, "dv_masked_fraction": 0.0}

    t.delete("k < 20", mode="dv")
    m = t.dv_metrics()
    assert m["dv_masked_rows"] == 20
    assert m["dv_bytes"] > 0
    assert m["dv_masked_fraction"] == pytest.approx(0.1)
    d = t.detail()
    assert d["dv_masked_rows"] == 20 and d["dv_masked_fraction"] == pytest.approx(0.1)

    t.delete("k >= 20 and k < 30", mode="dv")  # debt accrues
    assert t.dv_metrics()["dv_masked_rows"] == 30

    t.compact()
    assert t.dv_metrics() == {
        "dv_masked_rows": 0, "dv_bytes": 0, "dv_masked_fraction": 0.0}
    assert t.read().count() == 170


def test_maybe_compact_materializes_only_past_threshold(spark, tmp_path):
    """The executable form of the dv_metrics heuristic: under the
    threshold nothing happens (no table-sized rewrite on small debt),
    past it one full compact retires the vectors."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k long, v string"))
    t.delete("k < 4", mode="dv")  # 2% masked
    v = t.latest_version()
    assert t.maybe_compact(max_masked_fraction=0.05) is None
    assert t.latest_version() == v  # under threshold: untouched

    t.delete("k >= 4 and k < 30", mode="dv")  # 15% masked
    out = t.maybe_compact(max_masked_fraction=0.05)
    assert out == t.latest_version() and out > v
    assert t.dv_metrics()["dv_masked_rows"] == 0  # debt retired
    assert t.read().count() == 170
