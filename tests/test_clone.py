"""Shallow clone (Delta SHALLOW CLONE): zero-copy table forks whose
first manifest references the source's data dirs absolutely; the clone
then evolves independently and compact() fully un-shares it."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pixelspark.table import SnapshotTable


@pytest.fixture()
def src(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "src"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, v string, amt double",
        )
    )
    return t


def _local_data_dirs(root: str) -> set[str]:
    d = os.path.join(root, "data")
    return set(os.listdir(d)) if os.path.isdir(d) else set()


def test_clone_is_zero_copy_and_reads_equal(spark, src, tmp_path):
    dest = str(tmp_path / "fork")
    c = src.clone_to(dest)
    assert {tuple(r) for r in c.read().collect()} == {
        tuple(r) for r in src.read().collect()
    }
    assert _local_data_dirs(dest) == set()  # no bytes moved
    assert c.row_count() == 3  # manifest fast count carried over
    op = c.manifest(1)["op"]
    assert op["name"] == "clone" and op["source_version"] == 1


def test_clone_evolves_independently_of_source(spark, src, tmp_path):
    c = src.clone_to(str(tmp_path / "fork"))
    c.append(spark.createDataFrame([(9, "z", 9.0)], "k long, v string, amt double"))
    src.append(spark.createDataFrame([(8, "y", 8.0)], "k long, v string, amt double"))
    assert {r["k"] for r in c.read().collect()} == {1, 2, 3, 9}
    assert {r["k"] for r in src.read().collect()} == {1, 2, 3, 8}


def test_clone_carries_deletion_vectors(spark, src, tmp_path):
    src.delete(F.col("k") == 2, mode="dv")
    c = src.clone_to(str(tmp_path / "fork"))
    assert {r["k"] for r in c.read().collect()} == {1, 3}
    # DV DML on the clone masks the source's (foreign) files locally
    c.update({"v": F.lit("upd")}, F.col("k") == 1, mode="dv")
    assert {(r["k"], r["v"]) for r in c.read().collect()} == {(1, "upd"), (3, "c")}
    assert {r["k"] for r in src.read().collect()} == {1, 3}
    assert {(r["k"], r["v"]) for r in src.read().collect()} == {(1, "a"), (3, "c")}


def test_compact_unshares_the_clone(spark, src, tmp_path):
    dest = str(tmp_path / "fork")
    c = src.clone_to(dest)
    c.compact(num_files=1)
    m = c.manifest(c.latest_version())
    assert all("root" not in e for e in m["entries"]), "compact must localize"
    # the source can now disappear entirely; the clone keeps reading
    shutil.rmtree(src.root)
    assert {r["k"] for r in c.read().collect()} == {1, 2, 3}


def test_vacuum_on_clone_never_touches_source(spark, src, tmp_path):
    dest = str(tmp_path / "fork")
    c = src.clone_to(dest)
    c.append(spark.createDataFrame([(9, "z", 9.0)], "k long, v string, amt double"))
    c.compact(num_files=1)  # retires the foreign refs + the local append
    removed = c.vacuum(keep_versions=1)
    # only LOCAL dirs are ever reclaimed
    assert all(r.startswith("data/") for r in removed)
    assert {r["k"] for r in src.read().collect()} == {1, 2, 3}
    assert {r["k"] for r in c.read().collect()} == {1, 2, 3, 9}


def test_clone_destination_must_be_empty(spark, src, tmp_path):
    dest = str(tmp_path / "fork")
    src.clone_to(dest)
    with pytest.raises(ValueError, match="already has a table"):
        src.clone_to(dest)


def test_partitioned_clone_replace_partitions_keeps_foreign_parts(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "psrc"))
    t.replace_partitions(
        spark.createDataFrame(
            [("d1", 1), ("d2", 2)], "day string, k long"
        ),
        "day",
    )
    c = t.clone_to(str(tmp_path / "pfork"))
    c.replace_partitions(
        spark.createDataFrame([("d2", 22)], "day string, k long"), "day"
    )
    got = {(r["day"], r["k"]) for r in c.read().collect()}
    assert got == {("d1", 1), ("d2", 22)}  # d1 still served from the source
    m = c.manifest(c.latest_version())
    roots = {bool(e.get("root")) for e in m["entries"]}
    assert roots == {True, False}  # mixed foreign + local entries
    assert {(r["day"], r["k"]) for r in t.read().collect()} == {("d1", 1), ("d2", 2)}


def test_clone_preserves_column_mapping(spark, src, tmp_path):
    src.enable_column_mapping()
    src.rename_column("v", "label")
    c = src.clone_to(str(tmp_path / "fork"))
    assert {(r["k"], r["label"]) for r in c.read().collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }
    c.rename_column("label", "name")
    assert "name" in c.read().columns
    assert "label" in src.read().columns  # source untouched


def test_clone_cdf_within_clone_history(spark, src, tmp_path):
    c = src.clone_to(str(tmp_path / "fork"))
    c.append(spark.createDataFrame([(9, "z", 9.0)], "k long, v string, amt double"))
    ch = c.read_changes(from_version=1, to_version=2)
    assert {(r["k"], r["change_type"]) for r in ch.collect()} == {(9, "inserted")}


def test_partition_subset_compact_localizes_only_that_partition(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "psrc2"))
    t.replace_partitions(
        spark.createDataFrame(
            [("d1", 1), ("d1", 2), ("d2", 3)], "day string, k long"
        ),
        "day",
    )
    c = t.clone_to(str(tmp_path / "pfork2"))
    c.compact(partition_values=["d1"])
    m = c.manifest(c.latest_version())
    by_foreign = {bool(e.get("root")): e["parts"] for e in m["entries"]}
    assert by_foreign[False] == ["day=d1"]   # localized
    assert by_foreign[True] == ["day=d2"]    # still served from the source
    got = {(r["day"], r["k"]) for r in c.read().collect()}
    assert got == {("d1", 1), ("d1", 2), ("d2", 3)}
    # restore across the localize, and time travel, both stay readable
    c.restore(1)
    assert {(r["day"], r["k"]) for r in c.read().collect()} == got
    assert {(r["day"], r["k"]) for r in c.read(version=2).collect()} == got
