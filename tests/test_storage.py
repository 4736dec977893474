"""Storage-abstraction tests: both backends against the same contract,
the write paths that route through them, and the ledger precondition.

The Hadoop backend is exercised on file:// URIs — Spark's bundled
LocalFileSystem resolves through the identical scheme->FileSystem
lookup an hdfs:// or s3a:// path would take, so the JVM round-trip,
Path handling, and rename/delete/list semantics are the real code
path, just on local disk.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pixelspark import io as pio
from pixelspark.storage import (
    HadoopStorage,
    LocalStorage,
    ledger_precondition,
    storage_for,
)


def _contract(st, base: str) -> None:
    """The ops every backend must get right, run against `base`."""
    a, b = f"{base}/a", f"{base}/b"
    assert not st.exists(a)
    st.mkdirs(f"{a}/sub")
    assert st.exists(a)
    assert st.list(a) == ["sub"]
    assert not st.has_parquet(a)
    st.rename(a, b)
    assert not st.exists(a) and st.exists(b)
    assert st.list(b) == ["sub"]
    st.delete(b)
    assert not st.exists(b)
    assert st.list(b) == []  # missing dir lists empty, never raises


def test_local_storage_contract(tmp_path):
    _contract(LocalStorage(), str(tmp_path))


def test_hadoop_storage_contract(spark, tmp_path):
    _contract(HadoopStorage(spark), f"file://{tmp_path}")


def test_hadoop_has_parquet_and_swap(spark, tmp_path):
    st = HadoopStorage(spark)
    target = f"file://{tmp_path}/t"
    spark.range(10).write.parquet(target)
    assert st.has_parquet(target)
    staged = st.staging_path(target)
    spark.range(5).write.parquet(staged)
    st.swap_dir(staged, target)
    assert spark.read.parquet(target).count() == 5
    assert not st.exists(target.rstrip("/") + ".bak")


def test_storage_for_picks_backend(spark):
    assert isinstance(storage_for("/tmp/x"), LocalStorage)
    assert isinstance(storage_for("file:///tmp/x"), LocalStorage)
    assert isinstance(storage_for("hdfs://nn/x", spark), HadoopStorage)
    with pytest.raises(ValueError):
        storage_for("hdfs://nn/x")  # scheme needs a session


def test_table_exists_via_hadoop_uri(spark, tmp_path):
    """table_exists / upsert / compact accept scheme-qualified paths —
    the POSIX os.walk/os.rename assumptions are gone."""
    path = f"file://{tmp_path}/tbl"
    assert not pio.table_exists(spark, path)
    spark.range(20).select(F.col("id"), (F.col("id") % 3).alias("k")).write.parquet(path)
    assert pio.table_exists(spark, path)

    updates = spark.range(5).select(F.col("id"), F.lit(99).alias("k"))
    pio.upsert(spark, path, updates, keys=("id",))
    got = {r["id"]: r["k"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 20 and got[0] == 99 and got[19] == 19 % 3

    n = pio.compact(spark, path, target_files=2)
    assert n <= 2
    assert spark.read.parquet(path).count() == 20


def test_rollup_refresh_via_hadoop_uri(spark, sf_dir, tmp_path):
    from pixelspark.ops import rollup as R
    from pixelspark.schemas import load_table

    events = load_table(spark, sf_dir, "events")
    path = f"file://{tmp_path}/rollup"
    first = R.refresh_rollup(spark, path, events.where(F.to_date("ts") == "2024-01-02"))
    assert first and all(p.startswith("day=") for p in first)
    # fold in a second batch for the same day: counters must merge, not duplicate
    again = R.refresh_rollup(spark, path, events.where(F.to_date("ts") == "2024-01-02"))
    assert again == ["day=2024-01-02"]
    row = (
        R.read_rollup(spark, path)
        .agg(F.sum("n_events").alias("n"))
        .collect()[0]
    )
    base = events.where(F.to_date("ts") == "2024-01-02").count()
    assert row["n"] == 2 * base


def test_ledger_precondition(tmp_path):
    ledger_precondition(str(tmp_path / "ledger"))  # local: probe passes
    for scheme in ("s3a", "gs", "abfss"):
        with pytest.raises(ValueError, match="atomic create-if-absent"):
            ledger_precondition(f"{scheme}://bucket/ledger")


def test_charge_shops_rejects_object_store_ledger(spark):
    from pixelspark.ops import external as X

    plan = spark.createDataFrame(
        [(1, 5.0, "pending")], "shop long, amount double, status string"
    )
    with pytest.raises(ValueError, match="atomic create-if-absent"):
        X.charge_shops(plan, "2024-01-02", lambda s, a: "x", "s3a://bucket/ledger")


def test_ledger_probe_leaves_no_residue(tmp_path):
    d = tmp_path / "ledger"
    ledger_precondition(str(d))
    assert list(os.listdir(d)) == []  # probe file cleaned up


def test_recover_swap_after_simulated_crash(spark, tmp_path):
    """A crash between swap renames (target moved to .bak, staged not
    yet moved in) must be repairable: recover_swap restores the backup
    and the next upsert proceeds normally."""
    st = LocalStorage()
    target = str(tmp_path / "tbl")
    spark.range(10).select(F.col("id"), F.lit(1).alias("k")).write.parquet(target)
    # simulate the crash window: target renamed away, staged lost
    st.rename(target, target + ".bak")
    assert not st.exists(target)
    assert st.recover_swap(target) is True
    assert spark.read.parquet(target).count() == 10
    assert st.recover_swap(target) is False  # idempotent no-op
    # and the write paths self-heal: upsert after a crash works end-to-end
    st.rename(target, target + ".bak")
    updates = spark.range(3).select(F.col("id"), F.lit(9).alias("k"))
    pio.upsert(spark, target, updates, keys=("id",))
    got = {r["id"]: r["k"] for r in spark.read.parquet(target).collect()}
    assert len(got) == 10 and got[0] == 9 and got[9] == 1


def test_ledger_precondition_rejects_unknown_scheme(tmp_path):
    """hdfs:// (or any URI scheme) is not addressable by the POSIX
    O_EXCL claim API the worker-side ledger uses — passing it through
    would give every executor a private literal './hdfs:/...' ledger
    and break at-most-once.  Must be rejected, not silently accepted."""
    for uri in ("hdfs://nn/ledger", "viewfs://cluster/ledger", "ftp://h/ledger"):
        with pytest.raises(ValueError, match="POSIX"):
            ledger_precondition(uri)
    # file:// and scheme-less still pass the probe
    ledger_precondition(f"file://{tmp_path}/ledger2")


def test_local_rename_bare_relative_dst(tmp_path, monkeypatch):
    """A bare relative destination has an empty dirname; rename must
    not call os.makedirs('') (FileNotFoundError)."""
    from pixelspark.storage import LocalStorage

    monkeypatch.chdir(tmp_path)
    os.makedirs("srcdir")
    LocalStorage().rename("srcdir", "dstdir")
    assert os.path.isdir("dstdir") and not os.path.exists("srcdir")


def test_snapshot_commit_swap_on_hadoop_backend(spark, tmp_path):
    """The snapshot-commit path that makes table swaps atomic on
    object stores (pixelspark/table.py), driven here through the
    Hadoop FileSystem backend (file:// scheme) — the same code path a
    s3a:// root would take: manifest publication via
    write_text_atomic, no rename of live data anywhere."""
    from pixelspark.storage import HadoopStorage
    from pixelspark.table import SnapshotTable

    root = f"file://{tmp_path}/snaptbl"
    t = SnapshotTable(spark, root)
    t.st = HadoopStorage(spark)  # file:// maps to Local by default; force the JVM path
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.upsert(spark.createDataFrame([(1, "b"), (2, "c")], "k long, v string"), keys=("k",))
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "b", 2: "c"}
    # optimistic-concurrency primitive: second publish of the same
    # manifest version must LOSE (returns False), not overwrite
    path = t._manifest_path(t.latest_version())
    assert t.st.write_text_atomic(path, "{}") is False
    assert "entries" in t.st.read_text(path)
