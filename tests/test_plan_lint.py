"""Registry-wide physical-plan lint: two anti-patterns that silently
destroy 100-TB viability are banned MECHANICALLY across every query in
the registry, not just audited for the headline ones.

* BatchEvalPython — a row-at-a-time Python UDF in the plan means every
  row crosses the JVM<->Python boundary unvectorized (~10-100x the
  Arrow path).  The engine's rule is built-ins first, Arrow-batched
  pandas forms where Python is unavoidable; zero registry queries may
  plan a row UDF.
* CartesianProduct — an unguarded all-pairs join.  The only allowed
  instance is the explicitly guarded tiny-dims cross join
  (q_cross_join); broadcast fan-outs (cosine_topk etc.) plan as
  BroadcastNestedLoopJoin over a broadcast side and are fine.
* Window fed by Exchange SinglePartition — `Window.orderBy(...)`
  with no partitionBy funnels the ENTIRE input relation through one
  task (Spark's own WindowExec warning).  Fine over provably bounded
  inputs (post-limit rank windows never even plan the exchange —
  TakeOrderedAndProject is already single-partition; day-grain
  aggregates are calendar-sized); fatal over corpus- or
  vocabulary-scale relations at 100 TB.  Every offender must either
  use a distributed primitive (ops.relational.assign_row_ids,
  per-shard cumsum with broadcast base offsets) or sit in the
  explicit bounded-input allowlist below with a justification.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from pixelspark import queries as Q

CARTESIAN_ALLOWED = {"q_cross_join"}

# Window-over-Exchange-SinglePartition allowlist: ONLY for inputs that
# are bounded by construction, with the bound stated.  Corpus/vocab/
# fact-scale inputs may NOT be added here — fix the plan instead
# (assign_row_ids / per-shard cumsum / TakeOrderedAndProject).
WINDOW_SINGLE_PARTITION_ALLOWED: dict[str, str] = {
    "q_running_total": "input is one row per DAY (calendar-bounded: "
    "~365 rows/year even at 100 TB of events)",
    "q_lag_daily": "day-grain input, calendar-bounded",
    "q_moving_avg": "day-grain input, calendar-bounded",
    "q_dense_rank_ntile": "global rank over the SUPPLIER DIMENSION — "
    "dim-sized by definition; the operator's semantics are a total "
    "order over the dim",
}

_PASSTHROUGH = {
    "Sort",
    "Project",
    "Filter",
    "Window",
    "WindowGroupLimit",
    "ColumnarToRow",
    "InputAdapter",
}

_TREE_NODE = re.compile(r"([A-Za-z][A-Za-z0-9]*(?: [A-Za-z][A-Za-z0-9]*)*)\s+\((\d+)\)")


def _window_over_single_partition(plan: str) -> bool:
    """True when a Window node's unary input chain reaches an Exchange
    whose Arguments are SinglePartition — the one-task global window.

    Parses the `formatted` explain: the tree section gives adjacency
    (a unary node's child is the next line), the details section gives
    each Exchange's partitioning.
    """
    single_ids = {
        m.group(1)
        for m in re.finditer(
            r"^\((\d+)\) Exchange\n(?:[^\n]+\n)*?Arguments: SinglePartition",
            plan,
            re.M,
        )
    }
    if not single_ids:
        return False
    tree = plan.split("\n\n", 1)[0]
    nodes = []  # (line_index, name, id)
    for line in tree.splitlines():
        m = _TREE_NODE.search(line)
        if m:
            nodes.append((m.group(1).strip(), m.group(2)))
    for i, (name, _nid) in enumerate(nodes):
        if name != "Window":
            continue
        # walk the unary child chain (printed depth-first: child of a
        # unary node is simply the next tree line)
        for cname, cid in nodes[i + 1 :]:
            if cname == "Exchange":
                if cid in single_ids:
                    return True
                break
            if cname not in _PASSTHROUGH:
                break  # non-exchange input (TakeOrderedAndProject, scan,
                # join leg): window inherits a bounded/partitioned child
    return False


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    plans = {}
    for name, fn in Q.QUERIES.items():
        try:
            plans[name] = _plan(fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - lint must see every plan
            pytest.fail(f"{name}: explain failed: {e}")
    return plans


def test_no_row_python_udfs_anywhere(all_plans):
    import re

    # BatchEvalPythonUDTF is the (deliberate, documented) Python UDTF
    # surface — only the scalar row-UDF node is banned
    pat = re.compile(r"BatchEvalPython(?!UDTF)")
    offenders = [n for n, p in all_plans.items() if pat.search(p)]
    assert not offenders, f"row-at-a-time Python UDF planned in: {offenders}"


def test_no_unguarded_cartesian_products(all_plans):
    offenders = [
        n
        for n, p in all_plans.items()
        if "CartesianProduct" in p and n not in CARTESIAN_ALLOWED
    ]
    assert not offenders, f"unguarded cartesian product planned in: {offenders}"


def test_lint_detects_a_reverted_global_window(spark, sf_dir):
    """Revert-guard: the exact shape the round-5 offenders had — an
    unpartitioned window over a corpus-scale scan — must trip the
    detector (proves the lint would catch a regression of any of the
    four rewritten queries), while a post-limit bounded window must
    not (TakeOrderedAndProject feeds it without an exchange)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from pixelspark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    bad = docs.withColumn(
        "rank", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert _window_over_single_partition(_plan(bad))
    good = docs.orderBy("doc_id").limit(100).withColumn(
        "rank", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert not _window_over_single_partition(_plan(good))


def test_no_single_partition_global_windows(all_plans):
    offenders = [
        n
        for n, p in all_plans.items()
        if _window_over_single_partition(p)
        and n not in WINDOW_SINGLE_PARTITION_ALLOWED
    ]
    assert not offenders, (
        "Window over Exchange SinglePartition (whole relation through one "
        f"task) planned in: {offenders} — use assign_row_ids / per-shard "
        "cumsum, or allowlist with a bounded-input justification"
    )
