"""Concurrent-writer interleaving fuzz (r10, VERDICT item 3).

The optimistic-concurrency surface — commit rebase, id-watermark CAS,
the partition-evolution-races-append layout guard — was pinned by
targeted tests only; the storage fuzz is single-threaded.  This fuzz
drives TWO writers with a CONTROLLED interleave at the exact CAS
boundary: writer A runs its op normally, but an intercepting storage
wrapper fires writer B's ENTIRE op (through a separate, unwrapped
table handle) immediately before A's Nth manifest put-if-absent.
A's attempt then loses the create race and its machinery must rebase
(re-run the read-merge-write, re-stage under the new layout/mapping,
re-draw ids past the rival's watermark) or refuse with the documented
conflict error.  Deterministic — no threads, no sleeps, every
interleaving replays exactly.

Invariants, per VERDICT r9 item 3:
  * SERIALIZABILITY — the surviving table state equals applying the
    two ops to the model in SOME serial order (B-then-A or A-then-B);
    if A refused (ConcurrentWriteConflict / ConcurrentCommitError /
    the documented ValueError refusals), the state equals B alone.
  * WATERMARK MONOTONICITY — the row-tracking high watermark never
    decreases across the surviving history.
  * NO ID REUSE — across every readable version, a given __row_id is
    attached to exactly one key, ever (a rebased writer must re-draw
    ids the rival burned, never re-issue them).

Seeded (always-run) cases: the append-races-partition-evolution layout
guard from late-r9, and the upsert/upsert rebase (the lost-update
classic).
"""
from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pixelspark.table import (
    ConcurrentCommitError,
    ConcurrentWriteConflict,
    SnapshotTable,
)

# SLOW TIER (r13): the CAS-window interleaving sweeps —
# certification-depth work excluded from the default fast tier
# (pytest.ini); run with -m slow, or -m "" for the whole suite.
pytestmark = pytest.mark.slow

FUZZ_EXAMPLES = int(os.environ.get("PIXELSPARK_FUZZ_EXAMPLES", "8"))

SCHEMA = "k long, day int, v int"  # v int so the widen op has headroom

# SANCTIONED refusals: the engine's documented conflict errors, plus
# the SPECIFIC ValueError refusal texts the op pool can legitimately
# hit when racing (duplicate add_columns replay; idempotent re-widen —
# long->long is "not a supported widening").  Bare ValueError was too
# wide (r11 advisor): it would have absorbed a real regression that
# raised ValueError mid-op.  Any OTHER ValueError now surfaces as an
# unsanctioned failure.
_SANCTIONED = (ConcurrentWriteConflict, ConcurrentCommitError)
_REFUSAL_TEXTS = ("columns already exist", "cannot widen")


def _is_sanctioned(e: BaseException) -> bool:
    return isinstance(e, _SANCTIONED) or (
        isinstance(e, ValueError)
        and any(t in str(e) for t in _REFUSAL_TEXTS)
    )


class InterceptStorage:
    """Delegating storage that fires `hook` ONCE, immediately before
    the `nth` manifest put-if-absent — the CAS boundary."""

    def __init__(self, inner, hook, nth: int = 1) -> None:
        self._inner = inner
        self._hook = hook
        self._countdown = nth

    def write_text_atomic(self, path: str, content: str) -> bool:
        if "/_manifests/" in path and self._hook is not None:
            self._countdown -= 1
            if self._countdown <= 0:
                hook, self._hook = self._hook, None
                hook()
        return self._inner.write_text_atomic(path, content)

    def __getattr__(self, name):
        return getattr(self._inner, name)


# -- the op pool ------------------------------------------------------
# Each op is (name, param); realize(op, band) returns
# (apply(table) -> None, model(dict) -> dict).  `band` gives each
# writer a disjoint fresh-key range; SHARED keys 0..5 come from the
# seed so upserts/deletes/updates collide on purpose.


def _df(spark, rows: dict[int, tuple]):
    return spark.createDataFrame(
        [(k, d, v) for k, (d, v) in sorted(rows.items())], SCHEMA
    ).coalesce(2)


def _batch(ks, tag: int) -> dict[int, tuple]:
    return {k: (k % 3, k * 10 + tag) for k in ks}


OPS = ["append", "append_once", "upsert", "delete", "dv_delete",
       "update", "compact", "evolve", "add_col", "widen"]


def realize(spark, op: str, param: int, band: int):
    fresh = [band + param, band + param + 1]
    if op == "append":
        rows = _batch(fresh, tag=band % 97)

        def apply(t):
            t.append(_df(spark, rows))

        def model(m):
            return {**m, **rows}

    elif op == "append_once":
        rows = _batch(fresh, tag=band % 89)

        def apply(t):
            # app id is per-writer: two WRITERS sharing an (app_id,
            # batch_id) with DIFFERENT rows would violate append_once's
            # deterministic-replay contract (the engine would rightly
            # dedup one of them away); the legitimate same-batch race
            # has its own seeded test below
            t.append_once(_df(spark, rows), f"fuzzapp{band}", param + 1)

        def model(m):
            return {**m, **rows}

    elif op == "upsert":
        hits = [param % 6, (param + 1) % 6]  # seed keys: collide
        rows = {**_batch(hits, tag=band % 83), **_batch(fresh, tag=7)}

        def apply(t):
            t.upsert(_df(spark, rows), keys=("k",))

        def model(m):
            return {**{k: r for k, r in m.items() if k not in rows}, **rows}

    elif op in ("delete", "dv_delete"):
        mod = 2 + param % 3

        def apply(t):
            t.delete(f"k % {mod} = 0",
                     mode="dv" if op == "dv_delete" else "rewrite")

        def model(m):
            return {k: r for k, r in m.items() if k % mod != 0}

    elif op == "update":
        mod = 2 + param % 3

        def apply(t):
            t.update({"v": F.lit(band + 500)},
                     condition=F.expr(f"k % {mod} = 0"))

        def model(m):
            return {k: ((d, band + 500) if k % mod == 0 else (d, v))
                    for k, (d, v) in m.items()}

    elif op == "compact":
        def apply(t):
            t.compact()

        def model(m):
            return m

    elif op == "evolve":
        def apply(t):
            t.evolve_partitioning("day")

        def model(m):
            return m

    elif op == "add_col":
        # name embeds the writer's band so two writers never collide
        # on the duplicate-column refusal by accident; a REPLAYED
        # identical op (same band+param on both sides) still can —
        # that is exactly the sanctioned-refusal case the harness
        # models via b_landed
        def apply(t):
            t.add_columns({f"c{band}_{param}": "string"})

        def model(m):
            return m  # rows (k, day, v) unchanged

    elif op == "widen":
        # metadata-only type widening racing DML: v int -> long.
        # Idempotence refusal (already long) is sanctioned.
        def apply(t):
            t.widen_column("v", "long")

        def model(m):
            return m  # values compare as python ints either way

    else:  # pragma: no cover
        raise AssertionError(op)
    return apply, model


def _read_rows(t: SnapshotTable, version=None) -> dict[int, tuple]:
    return {r["k"]: (r["day"], r["v"])
            for r in t.read(version=version)
                      .select("k", "day", "v").collect()}


def _seed_table(spark, tmp_path, tracking: bool):
    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    seed = _batch(range(6), tag=1)
    t.overwrite(_df(spark, seed))
    if tracking:
        t.enable_row_tracking(backfill=True)
    return root, t, seed, t.latest_version()


def _fire(apply, handle, landed: list, unexpected: list):
    """Run a rival op; a SANCTIONED refusal (the engine's documented
    conflict/refusal errors) marks it not-landed — the audit then
    compares against the serial orders where it no-ops, mirroring how
    the victim's refusals are treated (r10 verdict item 1).  Anything
    else is a real failure."""
    try:
        apply(handle)
    except Exception as e:  # noqa: BLE001 — re-asserted by the caller
        landed[0] = False
        if not _is_sanctioned(e):
            unexpected.append(e)


def _audit_tracking(spark, root: str, v_pre: int) -> None:
    """Watermark monotonicity + id non-reuse across readable history."""
    audit = SnapshotTable(spark, root)
    id_owner: dict[int, int] = {}
    last_high = -1
    for v in audit.versions():
        if v < v_pre:
            continue  # pre-tracking history carries no ids
        m = audit.manifest(v)
        high = (m.get("row_tracking") or {}).get("high", last_high)
        assert high >= last_high, (
            f"row-id watermark regressed at v{v}: {high} < {last_high}"
        )
        last_high = high
        for r in audit.read(version=v).select("k", "__row_id").collect():
            k, rid = r["k"], r["__row_id"]
            assert id_owner.setdefault(rid, k) == k, (
                f"__row_id {rid} reused: owned by k={id_owner[rid]}, "
                f"reissued to k={k} at v{v}"
            )


def _run_interleaved(spark, tmp_path, a, b, tracking: bool, nth: int):
    """Build a seeded table, run op B inside op A's CAS window, audit."""
    root, t, seed, v_pre = _seed_table(spark, tmp_path, tracking)

    a_apply, a_model = realize(spark, a[0], a[1], band=1000)
    b_apply, b_model = realize(spark, b[0], b[1], band=2000)

    rival = SnapshotTable(spark, root)  # unwrapped handle for B
    b_landed, b_err = [True], []

    def fire_b():
        _fire(b_apply, rival, b_landed, b_err)

    t.st = InterceptStorage(t.st, fire_b, nth=nth)
    a_landed = True
    try:
        a_apply(t)
    except Exception as e:  # noqa: BLE001
        if not _is_sanctioned(e):
            raise
        a_landed = False
    if t.st._hook is not None:
        # A needed fewer CAS attempts than `nth`: the window never
        # opened, so B runs strictly after — the degenerate (serial)
        # interleaving, still a valid order to audit against
        t.st._hook = None
        fire_b()
    assert not b_err, f"rival op {b} failed UNSANCTIONED: {b_err[0]}"

    # -- serializability ------------------------------------------------
    final = _read_rows(SnapshotTable(spark, root))
    if a_landed and b_landed[0]:
        want_ba = a_model(b_model(dict(seed)))
        want_ab = b_model(a_model(dict(seed)))
        assert final in (want_ba, want_ab), (
            f"A={a} interleaved with B={b} (nth={nth}) produced a state "
            f"matching NO serial order:\n got {final}\n BA  {want_ba}\n"
            f" AB  {want_ab}"
        )
    elif a_landed:
        assert final == a_model(dict(seed)), (
            f"B={b} refused (sanctioned), so only A={a} may be visible; "
            f"got {final}"
        )
    elif b_landed[0]:
        assert final == b_model(dict(seed)), (
            f"A={a} refused, so only B={b} may be visible; got {final}"
        )
    else:
        assert final == dict(seed), (
            f"both ops refused; the seed state must survive; got {final}"
        )

    if tracking:
        _audit_tracking(spark, root, v_pre)


# -- seeded always-run cases -------------------------------------------


def test_append_races_partition_evolution(spark, tmp_path):
    """The late-r9 layout guard: evolve commits inside append's CAS
    window; the append must re-stage under the NEW layout (or refuse),
    never publish an old-layout dir into a partitioned manifest."""
    _run_interleaved(spark, tmp_path, ("append", 0), ("evolve", 0),
                     tracking=False, nth=1)
    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    m = t.manifest(t.latest_version())
    if m.get("partition_col") == "day":
        for e in m["entries"]:
            assert e["parts"] is None or all(
                p.startswith("day=") for p in e["parts"])


def test_upsert_upsert_rebase(spark, tmp_path):
    """The lost-update classic: rival upsert commits inside ours'
    window; the rebase must re-run read-merge-write so BOTH writers'
    non-overlapping keys survive."""
    _run_interleaved(spark, tmp_path, ("upsert", 0), ("upsert", 2),
                     tracking=True, nth=1)


def test_append_once_same_batch_race_lands_exactly_once(spark, tmp_path):
    """Two writers racing the SAME (app_id, batch_id) with the same
    rows (foreachBatch speculative re-delivery): the loser's CAS must
    detect the winner's txn watermark mid-race and commit NOTHING —
    the batch lands exactly once, not twice."""
    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    seed = _batch(range(2), tag=1)
    t.overwrite(_df(spark, seed))
    rows = _batch([100, 101], tag=5)
    rival = SnapshotTable(spark, root)
    landed = []

    def fire_b():
        landed.append(rival.append_once(_df(spark, rows), "sameapp", 7))

    t.st = InterceptStorage(t.st, fire_b, nth=1)
    got = t.append_once(_df(spark, rows), "sameapp", 7)
    assert landed[0] is not None  # the rival (running alone) landed it
    assert got is None            # we detected the replay mid-race
    final = _read_rows(SnapshotTable(spark, root))
    assert final == {**seed, **rows}
    m = SnapshotTable(spark, root)
    assert m.manifest(m.latest_version())["txn"]["sameapp"] == 7


def test_append_races_append_id_watermark(spark, tmp_path):
    """Both writers draw ids from the same watermark; the loser's CAS
    must re-draw past the winner's burn — no id issued twice."""
    _run_interleaved(spark, tmp_path, ("append", 0), ("append", 2),
                     tracking=True, nth=1)


# -- the fuzz ----------------------------------------------------------

_op = st.tuples(st.sampled_from(OPS), st.integers(0, 3))


@pytest.mark.parametrize("tracking", [False, True])
@given(a=_op, b=_op, nth=st.integers(1, 2))
@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture,
                                 HealthCheck.data_too_large])
def test_interleaving_fuzz(spark, tmp_path_factory, tracking, a, b, nth):
    tmp = tmp_path_factory.mktemp("ilv")
    _run_interleaved(spark, tmp, a, b, tracking, nth)


def test_fuzz_catches_seeded_watermark_cas_bypass(spark, tmp_path,
                                                  monkeypatch):
    """Detection-power proof: disable the id-watermark CAS (the bug a
    naive 'last write wins' watermark merge would have) — two appends
    drawing from the same watermark then publish OVERLAPPING ids, and
    the audit's no-id-reuse invariant must catch it."""
    from pixelspark import table as table_mod

    real = table_mod.SnapshotTable._stamp_highs

    def no_cas(self, out, prev, highs, cas=True):
        # BUG (deliberate): append-shaped commits merge monotone
        # instead of refusing the raced range
        return real(self, out, prev, highs, cas=False)

    monkeypatch.setattr(table_mod.SnapshotTable, "_stamp_highs", no_cas)
    with pytest.raises(AssertionError, match="reused|serial order"):
        _run_interleaved(spark, tmp_path, ("append", 0), ("append", 2),
                         tracking=True, nth=1)


# -- r11: THREE-writer interleavings ------------------------------------
# C fires inside B's CAS window, which itself fires inside A's: the
# commit order on disk is C, B(, A-rebased).  The audit accepts any
# serial order of the ops that actually landed — refusals (sanctioned)
# must leave no trace.


def _run_interleaved3(spark, tmp_path, a, b, c, tracking: bool,
                      nth_a: int):
    root, t, seed, v_pre = _seed_table(spark, tmp_path, tracking)

    a_apply, a_model = realize(spark, a[0], a[1], band=1000)
    b_apply, b_model = realize(spark, b[0], b[1], band=2000)
    c_apply, c_model = realize(spark, c[0], c[1], band=3000)

    rival_b = SnapshotTable(spark, root)
    rival_c = SnapshotTable(spark, root)
    b_landed, c_landed = [True], [True]
    errs: list = []

    def fire_c():
        _fire(c_apply, rival_c, c_landed, errs)

    def fire_b():
        rival_b.st = InterceptStorage(rival_b.st, fire_c, nth=1)
        _fire(b_apply, rival_b, b_landed, errs)
        if rival_b.st._hook is not None:
            rival_b.st._hook = None
            fire_c()

    t.st = InterceptStorage(t.st, fire_b, nth=nth_a)
    a_landed = True
    try:
        a_apply(t)
    except Exception as e:  # noqa: BLE001
        if not _is_sanctioned(e):
            raise
        a_landed = False
    if t.st._hook is not None:
        t.st._hook = None
        fire_b()
    assert not errs, f"rival failed UNSANCTIONED: {errs[0]}"

    final = _read_rows(SnapshotTable(spark, root))
    landed = [m for ok, m in ((a_landed, a_model), (b_landed[0], b_model),
                              (c_landed[0], c_model)) if ok]
    import itertools
    wants = []
    for perm in itertools.permutations(landed):
        s = dict(seed)
        for mod in perm:
            s = mod(s)
        wants.append(s)
    if not wants:
        wants = [dict(seed)]
    assert final in wants, (
        f"A={a} B={b} C={c} (nth_a={nth_a}, landed="
        f"{(a_landed, b_landed[0], c_landed[0])}) matches NO serial "
        f"order of the landed ops:\n got {final}\n orders {wants}"
    )
    if tracking:
        _audit_tracking(spark, root, v_pre)


@pytest.mark.parametrize("tracking", [False, True])
@given(a=_op, b=_op, c=_op, nth_a=st.integers(1, 2))
@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture,
                                 HealthCheck.data_too_large])
def test_three_writer_fuzz(spark, tmp_path_factory, tracking, a, b, c,
                           nth_a):
    tmp = tmp_path_factory.mktemp("ilv3")
    _run_interleaved3(spark, tmp, a, b, c, tracking, nth_a)


def test_three_writer_ddl_races_dml_seeded(spark, tmp_path):
    """Always-run: widen (A) raced by delete (B) raced by append (C),
    with row tracking — DDL rebase, rewrite-DML rebase, and watermark
    CAS all in one interleave."""
    _run_interleaved3(spark, tmp_path, ("widen", 0), ("delete", 0),
                      ("append", 2), tracking=True, nth_a=1)


def test_three_writer_double_widen_one_lands(spark, tmp_path):
    """Always-run: the widen/widen idempotence refusal is SANCTIONED —
    exactly one widen lands, the other refuses cleanly, rows and the
    third writer's append survive."""
    _run_interleaved3(spark, tmp_path, ("widen", 0), ("widen", 1),
                      ("append", 0), tracking=False, nth_a=1)
    # whoever won: the declared type is long now


def test_evolve_then_delete_serial_composition(spark, tmp_path):
    """The exact composition that failed at r10 close (hypothesis
    example a=('evolve',0), b=('delete',0), nth=2: the window never
    opens and B runs serially AFTER the evolution) — now served by the
    mixed-layout rewrite fallback instead of refusing."""
    _run_interleaved(spark, tmp_path, ("evolve", 0), ("delete", 0),
                     tracking=True, nth=2)


# -- r11: catalog maintenance racing a writer (deterministic) ----------


def test_catalog_maintain_races_writer_seeded(spark, tmp_path):
    """TWO Catalog.maintain sweeps (vacuum + compaction) fire INSIDE a
    writer's CAS window — the r8 thread-race pin (two maintains racing
    a writer), now deterministic.  The writer must rebase (or refuse
    cleanly); the second sweep must see the first's compaction as a
    healthy no-op; maintenance must never eat the writer's committed
    rows or corrupt the published pin."""
    from pixelspark.catalog import Catalog

    root = str(tmp_path / "cat")
    cat = Catalog(spark, root)
    t = cat.create_table("t")
    for i in range(8):  # fragmented: maintenance has real work
        t.append(spark.createDataFrame([(i, i % 3, i * 10)], SCHEMA))
    cat.publish("t")

    fired = []

    def fire_maintain():
        # NOTE: default min_age retention on purpose — zero-retention
        # vacuum (min_age_hours=0) may legally eat a rival's staged,
        # not-yet-committed data dir (it is unreferenced garbage until
        # the commit), exactly the hazard Delta's retention-duration
        # check exists for.  The race under test is the COMPACTION
        # sweep vs the writer's CAS, which age-based retention leaves
        # fully active.
        c2 = Catalog(spark, root)
        fired.append(c2.maintain(keep_versions=2, table_keep_versions=2,
                                 max_live_entries=4))
        # the SECOND sweep lands in the same window: the first's fold
        # already retired the entry debt, so it must be a clean no-op
        c3 = Catalog(spark, root)
        fired.append(c3.maintain(keep_versions=2, table_keep_versions=2,
                                 max_live_entries=4))

    t.st = InterceptStorage(t.st, fire_maintain, nth=1)
    rows = {100: (1, 42)}
    try:
        t.append(_df(spark, rows))
        appended = True
    except Exception as e:  # noqa: BLE001
        if not _is_sanctioned(e):
            raise
        appended = False
    assert fired and fired[0]["tables"]["t"]["compacted_to"] is not None
    assert fired[1]["tables"]["t"]["compacted_to"] is None  # 2nd: no-op

    got = {r["k"]: (r["day"], r["v"])
           for r in SnapshotTable(spark, f"{root}/tables/t").read()
           .select("k", "day", "v").collect()}
    want = {i: (i % 3, i * 10) for i in range(8)}
    if appended:
        want.update(rows)
    assert got == want
    # a quiet follow-up pass runs clean and changes nothing visible
    Catalog(spark, root).maintain(keep_versions=2, table_keep_versions=2)
    got2 = {r["k"]: (r["day"], r["v"])
            for r in Catalog(spark, root).table("t").read()
            .select("k", "day", "v").collect()}
    assert got2 == want
