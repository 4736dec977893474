"""Streaming crash-injection matrix (r10, VERDICT item 4).

Checkpoint-loss replay was tested for the append and rollup sinks at
fixed points; this generalizes it: for each exactly-once sink type
(snapshot append, rollup fold, CDC apply, matview ingest+fold), a
crash is INJECTED at the sink's commit primitive mid-run — either
BEFORE the batch commits (the batch is lost and must be re-delivered)
or AFTER it commits but before the checkpoint acks (the at-least-once
redelivery window, where a guardless sink double-lands) — and the
query is then restarted under each checkpoint regime:

  * intact — normal recovery; the crashed batch re-delivers,
  * wiped   — catastrophic checkpoint loss; the WHOLE source replays
    from batch zero,
  * stale   — the checkpoint is rolled back to a copy taken before
    the new data arrived; every post-copy batch re-delivers.

Invariant in every cell: the final landed state equals the
exactly-once answer — zero duplicates, zero losses — via the
(app_id, batch_id) txn guard (append/rollup/matview source), the
fold-window-by-source-version watermark (matview view), or per-key
latest-change idempotence (CDC).

Micro-batch boundaries are real: maxFilesPerTrigger=1, one file per
batch.  Deterministic — the injected crash fires on an exact commit
call, no timing.
"""
from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pixelspark.streaming.daily as SD
from pixelspark import table as table_mod
from pixelspark.ops import matview as matview_mod
from pixelspark.table import SnapshotTable

# SLOW TIER (r13): the sink crash-recovery matrices —
# certification-depth work excluded from the default fast tier
# (pytest.ini); run with -m slow, or -m "" for the whole suite.
pytestmark = pytest.mark.slow


class InjectedCrash(RuntimeError):
    pass


def _install_crash(obj, attr, when: str, at: int = 1):
    """Wrap obj.attr to crash on the `at`-th call: `when='before'`
    skips the real call (the batch never lands), `when='after'` lets
    it commit first (the redelivery window).  Returns a restore fn."""
    real = getattr(obj, attr)
    state = {"n": 0}

    def wrapper(*a, **k):
        state["n"] += 1
        if state["n"] == at:
            if when == "before":
                raise InjectedCrash(f"before {attr}")
            out = real(*a, **k)
            raise InjectedCrash(f"after {attr}")
        return real(*a, **k)

    setattr(obj, attr, wrapper)
    return lambda: setattr(obj, attr, real)


def _crashed(run) -> None:
    """Run a sink expecting the injected crash to surface through
    awaitTermination; anything else (including NOT crashing) fails."""
    with pytest.raises(Exception) as e:
        run()
    assert "InjectedCrash" in repr(e.value) or "injected" in str(e.value) \
        or "before " in str(e.value) or "after " in str(e.value), (
        f"expected the injected crash, got: {e.value!r}"
    )


def _apply_ckpt_mode(mode: str, ckpt: str, stale_copy: str) -> None:
    if mode == "wiped":
        shutil.rmtree(ckpt, ignore_errors=True)
    elif mode == "stale":
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.copytree(stale_copy, ckpt)


MODES = [(k, c) for k in ("before", "after")
         for c in ("intact", "wiped", "stale")]


# -- shared event-source plumbing ---------------------------------------

def _stamp_new_files(src: str, order: int) -> None:
    """Give each source file a strictly increasing mtime: the file
    stream orders batches by (modification time, path), and files
    written within the same second would otherwise deliver in random
    path order — the CDC sink's convergence assumes in-order
    changelog delivery across batches."""
    import glob
    import os

    base = 4_000_000_000  # far future: fresh writes are always below
    for p in glob.glob(f"{src}/*.parquet"):
        if os.path.getmtime(p) >= base:
            continue  # already stamped by an earlier write
        os.utime(p, (base + order * 10, base + order * 10))


def _write_event_file(spark, src: str, lo: int, n: int = 8) -> None:
    rows = [(lo + i, f"2024-01-{(lo + i) % 5 + 1:02d} 03:00:00",
             (lo + i) % 3, "page_view", float((lo + i) % 7), None)
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("append").parquet(src)
    _stamp_new_files(src, lo + 1)


def _stream(spark, src, schema=None):
    kw = {"max_files_per_trigger": 1}
    if schema is not None:
        kw["schema"] = schema
    return SD.read_event_stream(spark, src, **kw)


# -- 1. snapshot append sink --------------------------------------------

@pytest.mark.parametrize("kill,ckpt_mode", MODES)
def test_append_sink_crash_matrix(spark, tmp_path, kill, ckpt_mode):
    src, root = str(tmp_path / "src"), str(tmp_path / "t")
    ckpt, stale = str(tmp_path / "ck"), str(tmp_path / "stale")
    for lo in (0, 100):
        _write_event_file(spark, src, lo)
    SD.run_snapshot_append_sink(
        _stream(spark, src).select("event_id", "user_id", "value"),
        root, ckpt, app_id="crash-mx")
    shutil.copytree(ckpt, stale)

    for lo in (200, 300):
        _write_event_file(spark, src, lo)
    restore = _install_crash(SnapshotTable, "append_once", kill)
    try:
        _crashed(lambda: SD.run_snapshot_append_sink(
            _stream(spark, src).select("event_id", "user_id", "value"),
            root, ckpt, app_id="crash-mx"))
    finally:
        restore()

    _apply_ckpt_mode(ckpt_mode, ckpt, stale)
    SD.run_snapshot_append_sink(
        _stream(spark, src).select("event_id", "user_id", "value"),
        root, ckpt, app_id="crash-mx")

    got = SnapshotTable(spark, root).read()
    assert got.count() == 32
    assert got.select("event_id").distinct().count() == 32


def test_append_sink_crash_at_second_batch(spark, tmp_path):
    """Kill-point deeper in the run: the FIRST new batch lands, the
    second crashes after commit — recovery must re-deliver only what
    the guard hasn't recorded."""
    src, root = str(tmp_path / "src"), str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    for lo in (0, 100, 200):
        _write_event_file(spark, src, lo)
    restore = _install_crash(SnapshotTable, "append_once", "after", at=2)
    try:
        _crashed(lambda: SD.run_snapshot_append_sink(
            _stream(spark, src).select("event_id", "user_id", "value"),
            root, ckpt, app_id="crash-2"))
    finally:
        restore()
    SD.run_snapshot_append_sink(
        _stream(spark, src).select("event_id", "user_id", "value"),
        root, ckpt, app_id="crash-2")
    got = SnapshotTable(spark, root).read()
    assert got.count() == 24
    assert got.select("event_id").distinct().count() == 24


# -- 2. rollup fold sink ------------------------------------------------

@pytest.mark.parametrize("kill,ckpt_mode", MODES)
def test_rollup_sink_crash_matrix(spark, tmp_path, kill, ckpt_mode):
    from pixelspark.ops import rollup as R
    from pixelspark.table import read_rollup_snapshot

    src, root = str(tmp_path / "src"), str(tmp_path / "t")
    ckpt, stale = str(tmp_path / "ck"), str(tmp_path / "stale")
    for lo in (0, 100):
        _write_event_file(spark, src, lo)
    SD.run_snapshot_rollup_sink(_stream(spark, src), root, ckpt,
                                app_id="roll-mx")
    shutil.copytree(ckpt, stale)

    for lo in (200, 300):
        _write_event_file(spark, src, lo)
    restore = _install_crash(table_mod, "refresh_rollup_snapshot", kill)
    try:
        _crashed(lambda: SD.run_snapshot_rollup_sink(
            _stream(spark, src), root, ckpt, app_id="roll-mx"))
    finally:
        restore()

    _apply_ckpt_mode(ckpt_mode, ckpt, stale)
    SD.run_snapshot_rollup_sink(_stream(spark, src), root, ckpt,
                                app_id="roll-mx")

    got = read_rollup_snapshot(spark, root).drop("avg_value")
    want = R.day_rollup(spark.read.parquet(src))
    bad = got.alias("g").join(
        want.alias("w"), ["shop", "day"], "full_outer"
    ).where(
        F.col("g.n_events").isNull() | F.col("w.n_events").isNull()
        | (F.col("g.n_events") != F.col("w.n_events"))
        | (F.col("g.sum_value") != F.col("w.sum_value"))
    )
    assert bad.count() == 0, "a fold double-counted or went missing"


# -- 3. CDC apply sink ----------------------------------------------------

CDC_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
    T.StructField("change_type", T.StringType()),
    T.StructField("seq", T.LongType()),
])


def _write_cdc_file(spark, src: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    _stamp_new_files(src, max(r[3] for r in rows))


def _cdc_apply_model(model: dict, rows: list[tuple]) -> dict:
    for k, v, ct, _seq in sorted(rows, key=lambda r: r[3]):
        if ct == "deleted":
            model.pop(k, None)
        else:
            model[k] = v
    return model


@pytest.mark.parametrize("kill,ckpt_mode", MODES)
def test_cdc_sink_crash_matrix(spark, tmp_path, kill, ckpt_mode):
    src, root = str(tmp_path / "src"), str(tmp_path / "t")
    ckpt, stale = str(tmp_path / "ck"), str(tmp_path / "stale")
    f0 = [(k, k * 10, "inserted", k + 1) for k in range(8)]
    f1 = ([(k, k * 10 + 1, "updated", 20 + k) for k in range(4)]
          + [(5, 0, "deleted", 27)])
    _write_cdc_file(spark, src, f0)
    _write_cdc_file(spark, src, f1)
    SD.run_snapshot_cdc_sink(_stream(spark, src, schema=CDC_SCHEMA),
                             root, ckpt, keys=("k",))
    shutil.copytree(ckpt, stale)

    f2 = [(k, k * 10, "inserted", 30 + k) for k in range(10, 14)]
    f3 = [(0, 0, "deleted", 50), (10, 999, "updated", 51)]
    _write_cdc_file(spark, src, f2)
    _write_cdc_file(spark, src, f3)
    restore = _install_crash(SnapshotTable, "merge", kill)
    try:
        _crashed(lambda: SD.run_snapshot_cdc_sink(
            _stream(spark, src, schema=CDC_SCHEMA), root, ckpt,
            keys=("k",)))
    finally:
        restore()

    _apply_ckpt_mode(ckpt_mode, ckpt, stale)
    SD.run_snapshot_cdc_sink(_stream(spark, src, schema=CDC_SCHEMA),
                             root, ckpt, keys=("k",))

    want: dict = {}
    for rows in (f0, f1, f2, f3):
        _cdc_apply_model(want, rows)
    got = {r["k"]: r["v"]
           for r in SnapshotTable(spark, root).read().collect()}
    assert got == want, f"replica diverged from the changelog: {got}"


# -- 4. matview ingest+fold sink ------------------------------------------

@pytest.mark.parametrize("kill,ckpt_mode", MODES)
def test_matview_sink_crash_matrix(spark, tmp_path, kill, ckpt_mode):
    """`kill='before'` crashes the SOURCE append (batch lost, must
    re-deliver); `kill='after'` crashes BETWEEN the source commit and
    the view fold — the documented healed window: the next trigger's
    fold picks up from the view's last folded source version."""
    src, sroot = str(tmp_path / "src"), str(tmp_path / "s")
    vroot = str(tmp_path / "v")
    ckpt, stale = str(tmp_path / "ck"), str(tmp_path / "stale")
    for lo in (0, 100):
        _write_event_file(spark, src, lo)

    def run(ck):
        SD.run_matview_sink(
            _stream(spark, src).select("event_id", "user_id", "value"),
            sroot, vroot, group_by=("user_id",), sum_cols=("value",),
            checkpoint=ck, app_id="mv-mx")

    run(ckpt)
    shutil.copytree(ckpt, stale)

    for lo in (200, 300):
        _write_event_file(spark, src, lo)
    if kill == "before":
        restore = _install_crash(SnapshotTable, "append_once", "before")
    else:
        restore = _install_crash(matview_mod, "refresh_agg_view", "before")
    try:
        _crashed(lambda: run(ckpt))
    finally:
        restore()

    _apply_ckpt_mode(ckpt_mode, ckpt, stale)
    run(ckpt)

    srows = SnapshotTable(spark, sroot).read()
    assert srows.count() == 32
    assert srows.select("event_id").distinct().count() == 32
    got = {(r["user_id"]): (r["n"], r["value"])
           for r in SnapshotTable(spark, vroot).read().collect()}
    want = {r["user_id"]: (r["n"], r["value"])
            for r in srows.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("value")).collect()}
    assert got == want, "view diverged from its source after recovery"
