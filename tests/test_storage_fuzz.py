"""Model-based storage fuzz (VERDICT r8 item 1).

A hypothesis stateful machine drives a random interleaved sequence of
the full DML/DDL surface on ONE SnapshotTable — append / upsert /
merge (dv & rewrite) / update (dv & rewrite) / delete (dv & rewrite) /
compact / add_columns / enable_column_mapping / rename_column /
drop_column / widen_column / enable_row_tracking(backfill) /
overwrite — against a driver-side reference model (a plain dict of
rows keyed by `k` plus expected schema / id / watermark state), and
checks after EVERY step:

  * read-back equality (multiset of rows vs the model),
  * `__row_id` stability (rows that survive keep the id they were
    first observed with; new rows draw fresh never-seen ids),
  * watermark monotonicity across commits, for both id slots,
  * manifest protocol invariants (row_tracking => `row-tracking`
    writer feature, column_mapping => `column-mapping` reader
    feature, recorded features match the derived set),
  * CDF consistency on the clean-semantics ops (append => pure
    inserts of exactly the appended rows; compact => zero changes).

Every composition bug this project found by hand in rounds 6-8
(bloom x widening, stream x add_columns, upsert id fan-out,
commit_multi no-op laundering analog) lives in exactly this
cross-product of features, which is why the programs interleave
them randomly rather than testing each feature in isolation.

Runtime: each program is ~8 steps x ~1-2 Spark jobs.  CI runs a
bounded number of programs (PIXELSPARK_FUZZ_EXAMPLES, default 8);
the certified 200-program sweep is run per-round via
  PIXELSPARK_FUZZ_EXAMPLES=200 python -m pytest tests/test_storage_fuzz.py
and its result recorded in COVERAGE.md.

Reference anchor: the storage engine exists to serve the
append-as-update pattern (reference src/services/billing.ts:133-163)
whose correctness contract is exactly read-back-after-rewrites.
"""
from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
    run_state_machine_as_test,
)
from pyspark.sql import functions as F

from pixelspark.table import (
    SnapshotTable,
    reader_features,
    writer_features,
)

FUZZ_EXAMPLES = int(os.environ.get("PIXELSPARK_FUZZ_EXAMPLES", "8"))
STEPS = int(os.environ.get("PIXELSPARK_FUZZ_STEPS", "8"))

_SPARK = None  # injected by the test functions (hypothesis machines
# are instantiated by the engine, so fixtures can't reach __init__)


def _schema_str(cols: list[tuple[str, str]]) -> str:
    return ", ".join(f"{n} {t}" for n, t in cols)


class StorageMachine(RuleBasedStateMachine):
    """One random program over one SnapshotTable vs a dict model."""

    # -- model ------------------------------------------------------
    # rows: {k: {col: value}} for the LOGICAL data columns (never
    #   __row_id — ids are engine-assigned, learned then pinned).
    # cols: [(name, sql_type)] logical schema, 'k' always first.
    # ids: {k: learned __row_id}; all_ids: every id ever observed.
    # highs: {slot: last seen watermark} for monotonicity.

    def __init__(self) -> None:
        super().__init__()
        self.spark = _SPARK
        self.dir = tempfile.mkdtemp(prefix="pixelspark-fuzz-")
        self.t = SnapshotTable(self.spark, f"{self.dir}/t")
        self.rows: dict[int, dict] = {}
        self.cols: list[tuple[str, str]] = [("k", "long"), ("v", "string")]
        self.next_k = 0
        self.next_col = 0
        self.tracking = False
        self.mapped = False
        self.ids: dict[int, int] = {}
        self.all_ids: set[int] = set()
        self.highs: dict[str, int] = {}

    def teardown(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)

    # -- helpers ----------------------------------------------------

    def _fresh_ks(self, n: int) -> list[int]:
        ks = list(range(self.next_k, self.next_k + n))
        self.next_k += n
        return ks

    def _mk_df(self, rows: list[dict]):
        data = [tuple(r.get(c) for c, _ in self.cols) for r in rows]
        return self.spark.createDataFrame(
            data, _schema_str(self.cols)).coalesce(4)

    def _value(self, k: int, tag: str) -> dict:
        """A full row for key k; non-key columns get deterministic,
        step-tagged values so every rewrite is observable."""
        out = {"k": k}
        for name, typ in self.cols[1:]:
            if typ in ("int", "long", "bigint"):
                out[name] = k * 10 + len(tag)
            else:
                out[name] = f"{tag}:{k}"
        return out

    # -- the invariant pack (runs after every rule) -------------------

    @invariant()
    def engine_matches_model(self) -> None:
        if not self.t.exists():
            assert not self.rows
            return
        df = self.t.read()
        got_cols = set(df.columns) - {"__row_id"}
        want_cols = {c for c, _ in self.cols}
        assert got_cols == want_cols, (got_cols, want_cols)
        recs = df.collect()
        got = sorted(
            tuple(r[c] for c, _ in self.cols) for r in recs
        )
        want = sorted(
            tuple(row.get(c) for c, _ in self.cols)
            for row in self.rows.values()
        )
        assert got == want, f"read-back mismatch:\n got {got}\nwant {want}"

        # __row_id: learned-then-pinned (assignment is partitioning-
        # dependent, so the model never predicts ids — it requires
        # stability once observed and freshness for new rows)
        if self.tracking:
            id_map = {r["k"]: r["__row_id"] for r in recs}
            assert None not in id_map.values(), "NULL __row_id served"
            assert len(set(id_map.values())) == len(id_map), (
                f"duplicate row ids: {id_map}")
            for k, rid in id_map.items():
                if k in self.ids:
                    assert self.ids[k] == rid, (
                        f"id churn for k={k}: {self.ids[k]} -> {rid}")
                else:
                    assert rid not in self.all_ids, (
                        f"recycled id {rid} for new k={k}")
                    self.ids[k] = rid
                    self.all_ids.add(rid)
            # rows gone from the table free their key, but the id
            # must never come back (all_ids keeps it)
            self.ids = {k: i for k, i in self.ids.items() if k in id_map}

    @invariant()
    def manifest_invariants(self) -> None:
        v = self.t.latest_version()
        if v is None:
            return
        m = self.t.manifest(v)
        # watermarks monotone per slot
        for slot in ("identity", "row_tracking"):
            spec = m.get(slot)
            if spec:
                assert spec["high"] >= self.highs.get(slot, 0), (
                    f"{slot} watermark regressed: "
                    f"{self.highs.get(slot)} -> {spec['high']}")
                self.highs[slot] = spec["high"]
        # protocol fences: recorded features == derived features, and
        # the feature implications hold
        assert set(m.get("reader_features") or []) == set(
            reader_features(m))
        assert set(m.get("writer_features") or []) == set(
            writer_features(m))
        if m.get("row_tracking"):
            assert "row-tracking" in (m.get("writer_features") or [])
        if m.get("column_mapping"):
            assert "column-mapping" in (m.get("reader_features") or [])

    # -- rules ------------------------------------------------------

    @initialize()
    def create(self) -> None:
        ks = self._fresh_ks(3)
        rows = [self._value(k, "init") for k in ks]
        self.t.append(self._mk_df(rows))
        for r in rows:
            self.rows[r["k"]] = r

    @rule(n=st.integers(min_value=1, max_value=3))
    def append(self, n: int) -> None:
        before = self.t.latest_version()
        ks = self._fresh_ks(n)
        rows = [self._value(k, "app") for k in ks]
        self.t.append(self._mk_df(rows))
        for r in rows:
            self.rows[r["k"]] = r
        # CDF: an append is pure inserts of exactly these rows
        ch = self.t.read_changes(before).collect()
        assert all(c["change_type"] == "inserted" for c in ch)
        assert sorted(c["k"] for c in ch) == sorted(ks)

    @rule(data=st.data())
    def upsert(self, data) -> None:
        if not self.rows:
            return
        hit = data.draw(st.lists(
            st.sampled_from(sorted(self.rows)), max_size=2, unique=True))
        new = self._fresh_ks(data.draw(st.integers(0, 2)))
        if not hit and not new:
            return
        rows = [self._value(k, "ups") for k in hit + new]
        self.t.upsert(self._mk_df(rows), keys=("k",))
        for r in rows:
            self.rows[r["k"]] = r

    @rule(data=st.data(), mode=st.sampled_from(["rewrite", "dv"]))
    def merge(self, data, mode: str) -> None:
        if not self.rows:
            return
        hit = data.draw(st.lists(
            st.sampled_from(sorted(self.rows)), max_size=2, unique=True))
        new = self._fresh_ks(data.draw(st.integers(0, 1)))
        if not hit and not new:
            return
        rows = [self._value(k, "mrg") for k in hit + new]
        self.t.merge(self._mk_df(rows), keys=("k",), mode=mode)
        for r in rows:
            self.rows[r["k"]] = r

    @rule(data=st.data(), mode=st.sampled_from(["rewrite", "dv"]))
    def delete(self, data, mode: str) -> None:
        if not self.rows:
            return
        victims = data.draw(st.lists(
            st.sampled_from(sorted(self.rows)), min_size=1, max_size=2,
            unique=True))
        self.t.delete(F.col("k").isin(victims), mode=mode)
        for k in victims:
            del self.rows[k]

    @rule(data=st.data(), mode=st.sampled_from(["rewrite", "dv"]))
    def update(self, data, mode: str) -> None:
        if not self.rows:
            return
        k = data.draw(st.sampled_from(sorted(self.rows)))
        # target the v-slot by its CURRENT name (rename may have moved
        # it) — a hardcoded 'v' would silently no-op on both sides
        # after a rename, erasing UPDATE coverage mid-program
        vcol = self.cols[1][0]
        self.t.update({vcol: F.lit(f"upd:{k}")},
                      condition=F.col("k") == k, mode=mode)
        self.rows[k][vcol] = f"upd:{k}"

    @rule()
    def compact(self) -> None:
        before = self.t.latest_version()
        self.t.compact()
        # CDF: a compact changes nothing logically
        ch = self.t.read_changes(before, keys=("k",)).collect()
        assert ch == [], f"compact leaked changes: {ch}"

    @rule()
    def add_column(self) -> None:
        name = f"c{self.next_col}"
        self.next_col += 1
        self.t.add_columns({name: "string"})
        self.cols.append((name, "string"))
        for r in self.rows.values():
            r[name] = None

    @precondition(lambda self: not self.mapped)
    @rule()
    def enable_mapping(self) -> None:
        self.t.enable_column_mapping()
        self.mapped = True

    @precondition(lambda self: self.mapped)
    @rule(data=st.data())
    def rename(self, data) -> None:
        renameable = [c for c, _ in self.cols[1:]]
        if not renameable:
            return
        old = data.draw(st.sampled_from(renameable))
        new = f"{old}_r"
        self.t.rename_column(old, new)
        self.cols = [(new if c == old else c, t) for c, t in self.cols]
        for r in self.rows.values():
            r[new] = r.pop(old, None)

    @precondition(lambda self: self.mapped)
    @rule(data=st.data())
    def drop(self, data) -> None:
        droppable = [c for c, _ in self.cols[2:]]  # keep k and v-slot
        if not droppable:
            return
        col = data.draw(st.sampled_from(droppable))
        self.t.drop_column(col)
        self.cols = [(c, t) for c, t in self.cols if c != col]
        for r in self.rows.values():
            r.pop(col, None)

    @rule()
    def widen(self) -> None:
        # add an int column once, widen it on a later draw
        narrow = [c for c, t in self.cols if t == "int"]
        if narrow:
            col = narrow[0]
            self.t.widen_column(col, "bigint")
            self.cols = [
                (c, "long" if c == col else t) for c, t in self.cols]
        else:
            name = f"w{self.next_col}"
            self.next_col += 1
            self.t.add_columns({name: "int"})
            self.cols.append((name, "int"))
            for r in self.rows.values():
                r[name] = None

    @precondition(lambda self: not self.tracking)
    @rule()
    def enable_tracking(self) -> None:
        self.t.enable_row_tracking(backfill=True)
        self.tracking = True

    @rule(n=st.integers(min_value=1, max_value=2))
    def overwrite(self, n: int) -> None:
        ks = self._fresh_ks(n)
        rows = [self._value(k, "ovw") for k in ks]
        self.t.overwrite(self._mk_df(rows))
        self.rows = {r["k"]: r for r in rows}
        # a fresh frame carries no ids: every surviving key is new
        self.ids = {}


def test_storage_fuzz(spark):
    """CI entry: PIXELSPARK_FUZZ_EXAMPLES random programs (default 8);
    the certified 200-program sweep runs per-round out of band."""
    global _SPARK
    _SPARK = spark
    run_state_machine_as_test(
        StorageMachine,
        settings=settings(
            max_examples=FUZZ_EXAMPLES,
            stateful_step_count=STEPS,
            deadline=None,
            suppress_health_check=[
                HealthCheck.too_slow,
                HealthCheck.data_too_large,
                HealthCheck.filter_too_much,
            ],
        ),
    )


def test_fuzz_catches_seeded_id_churn_bug(spark, monkeypatch):
    """Detection-power proof: reintroduce the classic id-churn bug
    (a rewrite path reassigning ALL ids instead of filling only the
    NULLs — the shape of the r8 upsert fan-out advisory) and assert
    the machine's __row_id stability invariant catches it."""
    global _SPARK
    _SPARK = spark

    from pixelspark import table as table_mod

    def churn_fill(df, spec):
        # BUG (deliberate): drop carried ids, reassign the whole frame
        out, nh = table_mod.SnapshotTable._assign_identity(
            df.drop(spec["col"]), spec)
        return out, nh

    monkeypatch.setattr(
        table_mod.SnapshotTable, "_fill_null_ids",
        staticmethod(churn_fill))

    class Seeded(StorageMachine):
        """Deterministic program: enable tracking, learn ids, then an
        upsert must churn the carried rows' ids under the seeded bug."""

    machine = Seeded()
    try:
        machine.create()
        machine.enable_tracking()
        machine.engine_matches_model()  # learn ids
        k = sorted(machine.rows)[0]
        machine.t.upsert(
            machine._mk_df([machine._value(k, "ups")]), keys=("k",))
        machine.rows[k] = machine._value(k, "ups")
        with pytest.raises(AssertionError, match="id churn|recycled id"):
            machine.engine_matches_model()
    finally:
        machine.teardown()
