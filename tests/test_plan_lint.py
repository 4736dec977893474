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
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pixelspark import queries as Q

CARTESIAN_ALLOWED = {"q_cross_join"}


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
