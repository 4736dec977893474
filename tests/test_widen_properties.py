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


# ---------------------------------------------------------------------------
# r8 (VERDICT item 6): the lattice × feature COMPOSITION matrix, end to
# end on real tables — the bloom×widening crash (git 72bffea) was found
# by audit; this makes that class of bug mechanical.  Each example
# draws a random lattice edge and a random feature (stats prune /
# bloom probe / CDF / matview fold), builds a table with narrow files,
# widens, appends wide files, and checks the feature still answers
# exactly.
# ---------------------------------------------------------------------------

import tempfile

from hypothesis import HealthCheck
from pyspark.sql import functions as F

from pixelspark.table import SnapshotTable

# (narrow sql type, wide sql type, value expr builder) — int inputs
# 1..50 representable losslessly in every narrow type below
_EDGES = [
    ("int", "bigint"),
    ("smallint", "int"),
    ("tinyint", "smallint"),
    ("int", "double"),
    ("float", "double"),
    ("int", "decimal(12,2)"),
    ("bigint", "decimal(22,2)"),
    ("decimal(5,2)", "decimal(12,4)"),
    ("date", "timestamp_ntz"),
]
_FEATURES = ["stats", "bloom", "cdf", "matview"]


def _typed(spark, ks, sql_type):
    df = spark.createDataFrame([(k,) for k in ks], "k int")
    if sql_type in ("date", "timestamp_ntz"):
        v = F.date_add(F.to_date(F.lit("2024-01-01")),
                       F.col("k")).cast(sql_type)
    else:
        v = F.col("k").cast(sql_type)
    return df.select("k", v.alias("v"))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edge=st.sampled_from(_EDGES),
    feature=st.sampled_from(_FEATURES),
    ks0=st.lists(st.integers(1, 50), min_size=1, max_size=5, unique=True),
    ks1=st.lists(st.integers(1, 50), min_size=1, max_size=5, unique=True),
)
@pytest.mark.slow  # deep end-to-end matrix: certification tier (r13; pytest.ini)
def test_widening_composes_with_every_feature(spark, edge, feature, ks0, ks1):
    narrow, wide = edge
    if feature == "matview" and narrow == "date":
        ks1 = [k + 50 for k in ks1]  # distinct groups keep counts simple
    root = tempfile.mkdtemp(prefix="pixelspark_widenprop_")
    t = SnapshotTable(
        spark, root + "/t",
        stats_cols=("k",) if feature == "stats" else None,
        bloom_cols=("k",) if feature == "bloom" else None,
    )
    t.append(_typed(spark, ks0, narrow))
    v_narrow = t.latest_version()
    if feature == "matview":
        # fold the narrow window FIRST so the second fold's change
        # window SPANS the widening DDL commit
        from pixelspark.ops.matview import refresh_agg_view

        view = SnapshotTable(spark, root + "/view")
        refresh_agg_view(t, view, group_by=("k",))
    t.widen_column("v", wide)
    t.append(_typed(spark, ks1, wide))

    expect = {}
    for k in ks0:
        expect[k] = expect.get(k, 0) + 1
    for k in ks1:
        expect[k] = expect.get(k, 0) + 1

    if feature in ("stats", "bloom"):
        # point probes hit rows in NARROW files and WIDE files alike,
        # through the sidecar prune path, at the declared wide type
        for k in {ks0[0], ks1[0]}:
            got = t.read(predicates=[("k", "=", k)]).where(
                F.col("k") == k).collect()
            assert len(got) == expect[k], (edge, feature, k)
            assert all(
                r["v"] is not None and type(r["v"]) is type(got[0]["v"])
                for r in got)
    elif feature == "cdf":
        ch = t.read_changes(v_narrow + 1)  # the post-widen append only
        rows = ch.collect()
        assert sorted(r["k"] for r in rows) == sorted(ks1)
        assert all(r["change_type"] == "inserted" for r in rows)
        # the whole-history feed serves every row AT THE WIDE TYPE
        allrows = t.read_changes(0).collect()
        assert len(allrows) == len(ks0) + len(ks1)
        assert len({type(r["v"]) for r in allrows}) == 1
    else:  # matview fold across the widening DDL
        refresh_agg_view(t, view, group_by=("k",))
        got = {r["k"]: r["n"] for r in view.read().collect()}
        assert got == expect, (edge, got, expect)
