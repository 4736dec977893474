"""Partition evolution (Iceberg-style): the partition column changes
as a metadata commit; already-written entries keep their own layout
and stay readable; partition-values pruning stays SOUND by refusing
mixed-layout tables until a full compact rewrites history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixelspark.table import SnapshotTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "pe"))
    t.replace_partitions(
        spark.createDataFrame(
            [("d1", "r1", 1), ("d2", "r2", 2)],
            "day string, region string, k long",
        ),
        "day",
    )
    return t


def test_evolution_is_metadata_only_and_reads_union_layouts(spark, tbl):
    v = tbl.evolve_partitioning("region")
    m = tbl.manifest(v)
    assert m["partition_col"] == "region"
    assert m["entries"] == tbl.manifest(v - 1)["entries"]  # zero data churn
    tbl.replace_partitions(
        spark.createDataFrame([("d3", "r1", 3)], "day string, region string, k long"),
        "region",
    )
    got = {(r["day"], r["region"], r["k"]) for r in tbl.read().collect()}
    assert got == {("d1", "r1", 1), ("d2", "r2", 2), ("d3", "r1", 3)}
    # both layouts live side by side
    layouts = {
        tbl._entry_layout(e) for e in tbl.manifest(tbl.latest_version())["entries"]
    }
    assert layouts == {"day", "region"}


def test_replace_never_drops_foreign_layout_entries(spark, tbl):
    tbl.evolve_partitioning("region")
    # replacing region=r1 must not touch (or drop) the day=* entries,
    # even though day=d1's ROW also has region r1
    tbl.replace_partitions(
        spark.createDataFrame([("dX", "r1", 9)], "day string, region string, k long"),
        "region",
    )
    got = {(r["day"], r["k"]) for r in tbl.read().collect()}
    assert got == {("d1", 1), ("d2", 2), ("dX", 9)}


def test_partition_values_pruning_refused_until_compact(spark, tbl):
    tbl.evolve_partitioning("region")
    tbl.replace_partitions(
        spark.createDataFrame([("d3", "r3", 3)], "day string, region string, k long"),
        "region",
    )
    with pytest.raises(ValueError, match="compact"):
        tbl.read(partition_values=["r3"])
    tbl.compact()  # full compact rewrites history into the region layout
    m = tbl.manifest(tbl.latest_version())
    assert {tbl._entry_layout(e) for e in m["entries"]} == {"region"}
    pruned = tbl.read(partition_values=["r1"])
    assert {r["k"] for r in pruned.collect()} == {1}
    assert {r["k"] for r in tbl.read().collect()} == {1, 2, 3}


def test_evolve_from_unpartitioned_history(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "pe2"))
    t.append(spark.createDataFrame([("d1", 1)], "day string, k long"))
    t.evolve_partitioning("day")
    t.replace_partitions(
        spark.createDataFrame([("d2", 2)], "day string, k long"), "day"
    )
    got = {(r["day"], r["k"]) for r in t.read().collect()}
    assert got == {("d1", 1), ("d2", 2)}
    # late-r9 (191eb79): appending to a now-partitioned table JOINS the
    # current layout instead of being refused — mirror of
    # tests/test_table.py::test_append_on_partitioned_table_joins_the_layout
    t.append(spark.createDataFrame([("d3", 3)], "day string, k long"))
    got = {(r["day"], r["k"]) for r in t.read().collect()}
    assert got == {("d1", 1), ("d2", 2), ("d3", 3)}
    m = t.manifest(t.latest_version())
    assert m["entries"][-1]["parts"] == ["day=d3"]


def test_evolution_guards(spark, tbl):
    with pytest.raises(ValueError, match="no such column"):
        tbl.evolve_partitioning("nope")
    tbl.enable_column_mapping()
    with pytest.raises(ValueError, match="column-mapping"):
        tbl.evolve_partitioning("region")
