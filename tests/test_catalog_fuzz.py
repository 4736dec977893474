"""Model-based CATALOG fuzz (r10, VERDICT item 2).

The r9 storage fuzz covers one SnapshotTable; the bug classes left
were cross-OBJECT: multi-table transactions, pin/publish visibility,
namespace maintenance sweeps, and matview refresh folds interleaved
with arbitrary source DML.  This machine drives a random program over
a whole `Catalog` namespace — three data tables plus one cataloged
aggregate matview — against a driver-side model, and checks after
EVERY step:

  * namespace integrity — `list_tables()` == the model's live names;
  * direct read-back — each table's rows == the model's current rows;
  * publication visibility — a PINNED binding's catalog-mediated read
    serves exactly the last published snapshot, no matter how far the
    table's own log has advanced since (the whole point of pins);
  * view integrity — the agg matview equals the model's
    recompute-from-source AT ITS LAST REFRESH, and nothing but a
    refresh (in particular not `maintain`) ever changes it.

Rules:
  * DML — append / upsert / delete(dv|rewrite) on any table through
    its catalog handle;
  * pin / publish / unpin — publish snapshots the model's current
    rows as the new expected catalog-read;
  * commit_multi — the classic row MOVE between two pinned tables
    (delete from a + append to b, one atomic publication) and a
    dual-append; the invariant afterwards demands BOTH pins advanced
    and BOTH catalog reads serve the post-transaction state (and
    before it, neither leaked);
  * refresh_view — fold the agg view forward over the source's CDF;
  * maintain — gentle (generous retention) and catalog-aggressive
    (catalog log vacuumed down to 3 versions) sweeps; both must leave
    every read identical;
  * rename_table / drop+rebind (data survives, pin forgotten) /
    drop(purge)+recreate (data gone);
  * audit_catalog_time_travel — `read(name, catalog_version=v)` for a
    recorded past catalog version must serve exactly the snapshot
    that was published then (the namespace-level analog of the
    storage fuzz's time-travel audit).

Runtime: bounded in CI via PIXELSPARK_FUZZ_EXAMPLES (default 8); the
certified >=100-program sweep runs per-round out of band and is
recorded in COVERAGE.md.
"""
from __future__ import annotations

import os
import shutil
import tempfile

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

from pixelspark.catalog import Catalog, CatalogVersionVacuumed
from pixelspark.ops import matview as MV

import pytest

# SLOW TIER (r13): the catalog-namespace hypothesis sweep —
# certification-depth work excluded from the default fast tier
# (pytest.ini); run with -m slow, or -m "" for the whole suite.
pytestmark = pytest.mark.slow

FUZZ_EXAMPLES = int(os.environ.get("PIXELSPARK_FUZZ_EXAMPLES", "8"))
STEPS = int(os.environ.get("PIXELSPARK_FUZZ_STEPS", "8"))

_SPARK = None  # injected by the test function (hypothesis machines
# are instantiated by the engine, so fixtures can't reach __init__)

STATUSES = ("x", "y", None)
SCHEMA = "k long, status string, views long"
VIEW = "agg"


def _agg(rows: dict[int, tuple]) -> dict:
    """The model's recompute-from-source: status -> (n, sum_views)."""
    out: dict = {}
    for _k, (status, views) in rows.items():
        n, s = out.get(status, (0, 0))
        out[status] = (n + 1, s + views)
    return out


class CatalogMachine(RuleBasedStateMachine):
    """One random program over a Catalog namespace vs a dict model."""

    def __init__(self) -> None:
        super().__init__()
        self.spark = _SPARK
        self.dir = tempfile.mkdtemp(prefix="pixelspark-catfuzz-")
        self.cat = Catalog(self.spark, f"{self.dir}/cat")
        # model ----------------------------------------------------
        self.names: list[str] = []          # live data-table names
        self.rows: dict[str, dict[int, tuple]] = {}   # current rows
        self.pub: dict[str, dict[int, tuple]] = {}    # pinned: snapshot
        self.view_expected: dict | None = None        # at last refresh
        self.src: str = ""                  # view source (tracks renames)
        self.audit: dict[int, dict[str, dict]] = {}   # catver -> pinned snaps
        self.next_k = 0
        self.next_name = 0

    def teardown(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)

    # -- helpers ----------------------------------------------------

    def _fresh_ks(self, n: int) -> list[int]:
        ks = list(range(self.next_k, self.next_k + n))
        self.next_k += n
        return ks

    def _df(self, rows: dict[int, tuple]):
        data = [(k, s, v) for k, (s, v) in sorted(rows.items())]
        return self.spark.createDataFrame(data, SCHEMA).coalesce(2)

    def _name_at(self, i: int) -> str:
        return self.names[i % len(self.names)]

    def _collect(self, df) -> dict[int, tuple]:
        return {r["k"]: (r["status"], r["views"])
                for r in df.select("k", "status", "views").collect()}

    def _record_audit(self) -> None:
        """Snapshot what every PINNED binding must serve when this
        catalog version is time-traveled to later."""
        v = self.cat.latest_version()
        if v is not None:
            self.audit[v] = {n: dict(s) for n, s in self.pub.items()}

    # -- lifecycle ---------------------------------------------------

    @initialize()
    def seed(self) -> None:
        for _ in range(3):
            name = f"t{self.next_name}"
            self.next_name += 1
            self.cat.create_table(name)
            seed = {k: ("x", k * 10) for k in self._fresh_ks(3)}
            self.cat.table(name).append(self._df(seed))
            self.names.append(name)
            self.rows[name] = seed
        self.src = self.names[0]
        self.cat.create_table(VIEW)

    # -- DML ---------------------------------------------------------

    @rule(i=st.integers(0, 2), n=st.integers(1, 3),
          s=st.sampled_from(STATUSES))
    def append(self, i: int, n: int, s) -> None:
        name = self._name_at(i)
        batch = {k: (s, k % 7) for k in self._fresh_ks(n)}
        self.cat.table(name).append(self._df(batch))
        self.rows[name].update(batch)

    @rule(i=st.integers(0, 2), s=st.sampled_from(STATUSES),
          take=st.integers(1, 2))
    def upsert(self, i: int, s, take: int) -> None:
        name = self._name_at(i)
        hit = sorted(self.rows[name])[:take]
        batch = {k: (s, k % 5 + 100) for k in hit}
        batch.update({k: (s, 1) for k in self._fresh_ks(1)})
        self.cat.table(name).upsert(self._df(batch), keys=("k",))
        self.rows[name].update(batch)

    @rule(i=st.integers(0, 2), mode=st.sampled_from(["rewrite", "dv"]),
          m=st.integers(2, 4))
    def delete(self, i: int, mode: str, m: int) -> None:
        name = self._name_at(i)
        if not self.rows[name]:
            return
        self.cat.table(name).delete(f"k % {m} = 0", mode=mode)
        self.rows[name] = {k: r for k, r in self.rows[name].items()
                           if k % m != 0}

    # -- publication ---------------------------------------------------

    @rule(i=st.integers(0, 2))
    def pin(self, i: int) -> None:
        name = self._name_at(i)
        if self.cat.table(name).latest_version() is None:
            return  # a commitless binding has nothing to pin
        self.cat.pin_table(name)
        self.pub[name] = dict(self.rows[name])
        self._record_audit()

    @rule(i=st.integers(0, 2), j=st.integers(0, 2))
    def publish(self, i: int, j: int) -> None:
        names = sorted({self._name_at(i), self._name_at(j)})
        names = [n for n in names
                 if self.cat.table(n).latest_version() is not None]
        if not names:
            return
        self.cat.publish(*names)
        for n in names:
            self.pub[n] = dict(self.rows[n])
        self._record_audit()

    @rule(i=st.integers(0, 2))
    def unpin(self, i: int) -> None:
        name = self._name_at(i)
        if name not in self.pub:
            return
        self.cat.unpin_table(name)
        self.pub.pop(name)
        self._record_audit()

    # -- multi-table transactions ---------------------------------------

    def _two_pinned(self) -> bool:
        return len(self.pub) >= 2

    @precondition(lambda self: self._two_pinned())
    @rule(take=st.integers(1, 2))
    def txn_move(self, take: int) -> None:
        """The classic: move rows between tables with no window where
        both or neither hold them (at the publication level)."""
        a, b = sorted(self.pub)[:2]
        if not self.rows[a]:
            return
        ks = sorted(self.rows[a])[:take]
        moved = {k: self.rows[a][k] for k in ks}
        got = self.cat.commit_multi({
            a: lambda t: t.delete(F.col("k").isin(ks)),
            b: lambda t: t.append(self._df(moved)),
        })
        assert set(got) == {a, b}, "txn must publish ALL participants"
        for k in ks:
            self.rows[a].pop(k)
        self.rows[b].update(moved)
        self.pub[a] = dict(self.rows[a])
        self.pub[b] = dict(self.rows[b])
        self._record_audit()

    @precondition(lambda self: self._two_pinned())
    @rule(s=st.sampled_from(STATUSES))
    def txn_dual_append(self, s) -> None:
        a, b = sorted(self.pub)[:2]
        ba = {k: (s, 3) for k in self._fresh_ks(1)}
        bb = {k: (s, 4) for k in self._fresh_ks(1)}
        self.cat.commit_multi({
            a: lambda t: t.append(self._df(ba)),
            b: lambda t: t.append(self._df(bb)),
        })
        self.rows[a].update(ba)
        self.rows[b].update(bb)
        self.pub[a] = dict(self.rows[a])
        self.pub[b] = dict(self.rows[b])
        self._record_audit()

    # -- matview -----------------------------------------------------

    @rule()
    def refresh_view(self) -> None:
        MV.refresh_agg_view(
            self.cat.table(self.src), self.cat.table(VIEW),
            group_by=("status",), sum_cols=("views",), src_keys=("k",),
        )
        self.view_expected = _agg(self.rows[self.src])

    # -- maintenance ---------------------------------------------------

    @rule()
    def maintain_gentle(self) -> None:
        rep = self.cat.maintain(keep_versions=100, table_keep_versions=100)
        for name, r in rep["tables"].items():
            assert "error" not in r, f"maintain failed on {name}: {r}"

    @rule()
    def maintain_catalog_aggressive(self) -> None:
        """Catalog-log vacuum down to 3 versions: live reads and pins
        must be untouched; recorded time-travel targets may go, so the
        audit history resets (the machine tests LIVE invariance here,
        the gentle path keeps testing time travel)."""
        self.cat.maintain(keep_versions=3, table_keep_versions=100)
        self.audit.clear()

    # -- namespace DDL -------------------------------------------------

    @rule(i=st.integers(0, 2))
    def rename(self, i: int) -> None:
        old = self._name_at(i)
        new = f"t{self.next_name}"
        self.next_name += 1
        self.cat.rename_table(old, new)
        self.names[self.names.index(old)] = new
        self.rows[new] = self.rows.pop(old)
        if old in self.pub:
            self.pub[new] = self.pub.pop(old)
        if self.src == old:
            self.src = new
        self._record_audit()

    @rule(i=st.integers(0, 2))
    def drop_and_rebind(self, i: int) -> None:
        """The documented repair path: a non-purge drop leaves data in
        place; re-creating the binding at the same location serves it
        again.  The PIN does not survive the drop."""
        name = self._name_at(i)
        loc = self.cat.describe(name)["root"]
        self.cat.drop_table(name)
        self.cat.create_table(name, location=loc)
        self.pub.pop(name, None)
        self._record_audit()

    @rule(i=st.integers(0, 2))
    def drop_purge_recreate(self, i: int) -> None:
        name = self._name_at(i)
        if name == self.src:
            return  # the view's fold history must keep its source
        self.cat.drop_table(name, purge=True)
        new = f"t{self.next_name}"
        self.next_name += 1
        self.cat.create_table(new)
        self.names[self.names.index(name)] = new
        self.rows.pop(name)
        self.rows[new] = {}
        self.pub.pop(name, None)
        # purge is documented-irreversible: older catalog versions
        # still BIND the name, but the data tree is gone — time travel
        # to them cannot serve the snapshot any more
        for snaps in self.audit.values():
            snaps.pop(name, None)
        self._record_audit()

    # -- history audit ---------------------------------------------------

    @precondition(lambda self: bool(self.audit))
    @rule(pick=st.integers(0, 10 ** 6))
    def audit_catalog_time_travel(self, pick: int) -> None:
        vs = sorted(self.audit)
        v = vs[pick % len(vs)]
        try:
            for name, snap in self.audit[v].items():
                got = self._collect(self.cat.read(name, catalog_version=v))
                assert got == snap, (
                    f"catalog time travel to v{v}: {name} served {got}, "
                    f"published snapshot was {snap}"
                )
        except CatalogVersionVacuumed:
            self.audit.pop(v)  # pruned by a racing aggressive sweep

    # -- standing invariants ----------------------------------------------

    @invariant()
    def namespace_and_reads(self) -> None:
        assert self.cat.list_tables() == sorted(self.names + [VIEW])
        for name in self.names:
            t = self.cat.table(name)
            # a just-recreated binding has no commits yet: empty
            got = {} if t.latest_version() is None else \
                self._collect(t.read())
            assert got == self.rows[name], (
                f"direct read of {name} diverged: {got} != {self.rows[name]}"
            )
        for name, snap in self.pub.items():
            got = self._collect(self.cat.read(name))
            assert got == snap, (
                f"pinned catalog read of {name} leaked unpublished state: "
                f"{got} != published {snap}"
            )

    @invariant()
    def view_holds(self) -> None:
        if self.view_expected is None:
            return
        got = {r["status"]: (r["n"], r["views"])
               for r in self.cat.read(VIEW).collect()}
        assert got == self.view_expected, (
            f"agg view diverged from recompute-at-last-refresh: "
            f"{got} != {self.view_expected}"
        )


def test_catalog_fuzz(spark):
    """CI entry: PIXELSPARK_FUZZ_EXAMPLES random programs (default 8);
    the certified >=100-program sweep runs per-round out of band."""
    global _SPARK
    _SPARK = spark
    run_state_machine_as_test(
        CatalogMachine,
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


def test_fuzz_catches_seeded_nonatomic_publication(spark, monkeypatch):
    """Detection-power proof: break commit_multi's atomicity (publish
    only the FIRST participant's pin, the bug a naive per-table
    publish loop would have) and assert the machine's pinned-read
    invariant catches the half-published state."""
    global _SPARK
    _SPARK = spark

    from pixelspark.catalog import Catalog as Cat

    real = Cat.commit_multi

    def half_publish(self, writes):
        first = dict(list(writes.items())[:1])
        out = real(self, first)
        # BUG (deliberate): the second participant's write runs but
        # its pin is never advanced in the same commit
        for name, fn in list(writes.items())[1:]:
            t = self.table(name)
            out[name] = fn(t)
        return out

    monkeypatch.setattr(Cat, "commit_multi", half_publish)

    class Seeded(CatalogMachine):
        pass

    machine = Seeded()
    try:
        machine.seed()
        machine.pin(0)
        machine.pin(1)
        try:
            machine.txn_move(take=1)
            machine.namespace_and_reads()
        except AssertionError:
            return  # caught — the invariant works
        raise AssertionError(
            "seeded non-atomic publication went undetected")
    finally:
        machine.teardown()
