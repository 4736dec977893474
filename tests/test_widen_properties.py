"""Property-based pins for the type-widening schema algebra
(`_widen_merge_schema`, `_widens_to`): the write-side reconcile must
behave like a join-semilattice on the widening order — idempotent,
monotone, never narrowing, never dropping or reordering declared
columns — for ANY mix of writer widths.  Pure driver-side logic, no
SparkSession needed."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from pixelspark.table import _widen_merge_schema, _widens_to

# widening CHAINS: index = level, higher is wider (each step and the
# transitive closure must satisfy _widens_to)
CHAINS = [
    [ByteType(), ShortType(), IntegerType(), LongType()],
    [FloatType(), DoubleType()],
    [DecimalType(5, 2), DecimalType(12, 4), DecimalType(20, 6)],
    [DateType(), TimestampNTZType()],
    [StringType()],  # no widening: must stay put
]


def test_chains_are_actually_widening():
    for chain in CHAINS:
        for i, lo in enumerate(chain):
            for hi in chain[i + 1:]:
                assert _widens_to(lo, hi), (lo, hi)
                assert not _widens_to(hi, lo), (hi, lo)


@st.composite
def schema_pair(draw):
    """(declared, written): same column names; written picks an
    independent level per column (narrower, equal, or wider), plus
    optional extra new columns."""
    n = draw(st.integers(1, 6))
    cols = [f"c{i}" for i in range(n)]
    decl_fields, writ_fields = [], []
    for c in cols:
        chain = draw(st.sampled_from(CHAINS))
        d_lv = draw(st.integers(0, len(chain) - 1))
        w_lv = draw(st.integers(0, len(chain) - 1))
        decl_fields.append(StructField(c, chain[d_lv], True))
        writ_fields.append((c, StructField(c, chain[w_lv], True)))
    # written column order is shuffled relative to declared
    writ_fields = draw(st.permutations(writ_fields))
    extra = draw(st.integers(0, 2))
    writ = [f for _, f in writ_fields] + [
        StructField(f"x{i}", draw(st.sampled_from(CHAINS))[0], True)
        for i in range(extra)
    ]
    return StructType(decl_fields), StructType(writ)


def _merge(a: StructType, b: StructType) -> StructType:
    return StructType.fromJson(
        json.loads(_widen_merge_schema(a.json(), b.json()))
    )


@settings(max_examples=200, deadline=None)
@given(schema_pair())
def test_merge_is_monotone_order_stable_and_never_narrows(pair):
    decl, writ = pair
    out = _merge(decl, writ)
    decl_by = {f.name: f.dataType for f in decl.fields}
    writ_by = {f.name: f.dataType for f in writ.fields}
    # declared columns keep their order and lead the result
    assert [f.name for f in out.fields[: len(decl.fields)]] == [
        f.name for f in decl.fields
    ]
    # new columns appended, none lost
    assert {f.name for f in out.fields} == set(decl_by) | set(writ_by)
    for f in out.fields:
        d, w = decl_by.get(f.name), writ_by.get(f.name)
        if d is not None and w is not None:
            # the WIDER of the two, never a narrowing of either
            assert f.dataType in (d, w)
            assert not _widens_to(f.dataType, d)
            assert not _widens_to(f.dataType, w)
        else:
            assert f.dataType == (d or w)


@settings(max_examples=100, deadline=None)
@given(schema_pair())
def test_merge_is_idempotent_and_absorbing(pair):
    decl, writ = pair
    out = _merge(decl, writ)
    # idempotent on its own result, from both sides
    assert _merge(out, out) == out
    assert _merge(out, decl) == out   # re-merging a narrower input
    # commutative up to column order on the common columns
    out_rev = _merge(writ, decl)
    assert {f.name: f.dataType for f in out_rev.fields} == {
        f.name: f.dataType for f in out.fields
    }


def test_merge_refuses_unrelated_type_change():
    a = StructType([StructField("c", IntegerType(), True)])
    b = StructType([StructField("c", StringType(), True)])
    with pytest.raises(ValueError, match="widening"):
        _widen_merge_schema(a.json(), b.json())
