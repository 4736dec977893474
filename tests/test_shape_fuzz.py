"""Data-shape robustness fuzz over the QUERY registry (r12, VERDICT
item 3).

The storage/catalog/concurrency surfaces have fuzzes; the query
registry's correctness was proven only on the fixed testdata
distributions.  This harness regenerates the parquet inputs in
adversarial shapes — empty tables, NULL join/text keys, unicode/emoji
text, single-key skew, constant (all-duplicate) timestamps — and
re-runs a broad subset of the driver's `_WINDOW_QUERIES` against the
SAME DuckDB oracles on that data (tools/check.py compare: row count +
schema + order-insensitive values).  A divergence here is exactly the
class the fixed-distribution sweep cannot see: NULL-semantics or
unicode-hashing disagreements between the Spark plan and the ANSI
oracle, tie-dependent results, empty-input crashes.

Two layers:
  * five deterministic profiles x ~26 window queries (always run);
  * a hypothesis layer drawing (null fraction, skew fraction, seed)
    that rebuilds events/documents and re-runs a cheap query core —
    PIXELSPARK_FUZZ_EXAMPLES examples (default 8), same knob as the
    other fuzzes.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# SLOW TIER (r13): the data-shape profile sweep over the registry —
# certification-depth work excluded from the default fast tier
# (pytest.ini); run with -m slow, or -m "" for the whole suite.
pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

FUZZ_EXAMPLES = int(os.environ.get("PIXELSPARK_FUZZ_EXAMPLES", "8"))


def _load_check():
    spec = importlib.util.spec_from_file_location(
        "pixelspark_checkmod", os.path.join(ROOT, "tools", "check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


CHECK = _load_check()

# Queries under the shape fuzz: a broad, mostly-compute slice of the
# driver window (membership asserted below — a rotation that drops one
# of these from the window fails loudly here instead of silently
# shrinking coverage).  Storage-lifecycle rows with data-independent
# in-query asserts are included; rows whose asserts are inherently
# distribution-bound (e.g. q_maintain_frag's fragmentation triggers)
# are not — the storage fuzzes own those.
SHAPE_QUERIES = [
    # billing / relational
    "q_daily_billing",
    "q_pageviews_agg",
    "q_billing_totals",
    "q_charge_plan",
    "q_status_counts",
    "q_unbilled_shops",
    "q_top_shops",
    "q_report_rows",
    "q_charge_execute",
    "q_target_date",
    # LLM pack
    "q_winnow_dedup",
    "q_minhash_pairs",
    "q_dedup_clusters",
    "q_dedup_clusters_star",
    "q_cross_dedup",
    "q_duplicate_spans",
    "q_curate_corpus",
    "q_repetition_signals",
    "q_quality_logreg",
    "q_domain_mix",
    "q_hybrid_search",
    "q_ann_topk",
    # storage lifecycles (source-shaped inputs flow into table DML)
    "q_schema_evolve",
    "q_dv_delete",
    "q_snapshot_merge",
    "q_table_dml",
    "q_expectations",
]

# the cheap core the hypothesis layer re-runs per drawn example
CORE_QUERIES = [
    "q_daily_billing",
    "q_pageviews_agg",
    "q_status_counts",
    "q_top_shops",
    "q_winnow_dedup",
    "q_domain_mix",
]


def test_shape_queries_are_window_queries():
    from pixelspark.queries import _WINDOW_QUERIES

    missing = [q for q in SHAPE_QUERIES if q not in _WINDOW_QUERIES]
    assert not missing, (
        f"shape-fuzz queries rotated out of the driver window: {missing} "
        "— reseat them or update SHAPE_QUERIES so coverage stays honest"
    )
    assert len(SHAPE_QUERIES) >= 20  # the r11 verdict's floor


# -- profile transforms -------------------------------------------------
# Each takes (table name, pandas frame, rng) and returns the reshaped
# frame; dtypes are restored by casting back to the source parquet
# schema on write, so Spark and DuckDB see the exact original types.

_UNICODE_POOL = [
    "naïve café \U0001f680\U0001f680 déjà-vu encore",
    "日本語のテキストです。"
    "形態素解析は難しい。",
    "مرحبا بالعال"
    "م هذا نص عربي",
    "emoji \U0001f600\U0001f600\U0001f600 zwj \U0001f469‍\U0001f469"
    "‍\U0001f467‍\U0001f466 flag \U0001f1fa\U0001f1f3 done",
    "combining áéí diacritics and ß sharp s",
    "zero​width​space and nbsp mixed tokens here",
    "ПРИВЕТ мир ёжик",
    "ทดสอบภาษาไท"
    "ย ไม่มีช่อง",
    "plain ascii text for contrast with the rest of the pool",
    "tabs\tand  double  spaces\tinside   one line",
]


def _empty(name: str, df: pd.DataFrame, rng) -> pd.DataFrame:
    return df.head(0)


def _null_keys(name: str, df: pd.DataFrame, rng) -> pd.DataFrame:
    df = df.copy()
    if name == "events":
        df.loc[df.index % 3 == 0, "user_id"] = None
        df.loc[df.index % 7 == 0, "event_type"] = None
    elif name == "orders":
        df.loc[df.index % 4 == 0, "o_custkey"] = None
    elif name == "documents":
        df.loc[df.index % 7 == 0, "text"] = None
        df.loc[df.index % 7 == 1, "text"] = ""
        df.loc[df.index % 7 == 2, "text"] = "   "
        df.loc[df.index % 5 == 0, "lang"] = None
    return df


def _unicode_text(name: str, df: pd.DataFrame, rng) -> pd.DataFrame:
    if name != "documents":
        return df
    df = df.copy()
    n = len(df)
    pool = _UNICODE_POOL
    # ~half the rows are exact duplicates of a pool entry (dedup has
    # real work); the rest get a per-row suffix (near-dup noise)
    text = [
        pool[i % len(pool)]
        if i % 2 == 0
        else f"{pool[i % len(pool)]} variant {i}"
        for i in range(n)
    ]
    df["text"] = text
    df["n_chars"] = [len(t) for t in text]
    return df


def _hot_key_skew(name: str, df: pd.DataFrame, rng) -> pd.DataFrame:
    df = df.copy()
    if name == "events":
        hot = int(df["user_id"].min()) if len(df) else 1
        mask = df.index % 10 != 0  # 90% of events on one key
        df.loc[mask, "user_id"] = hot
    elif name == "documents" and len(df):
        mega = df["text"].iloc[0]
        mask = df.index % 5 != 0  # 80% of docs identical: one giant CC
        df.loc[mask, "text"] = mega
        df["n_chars"] = df["text"].str.len()
    return df


def _constant_ts(name: str, df: pd.DataFrame, rng) -> pd.DataFrame:
    if name != "events" or not len(df):
        return df
    df = df.copy()
    df["ts"] = pd.Timestamp("2024-01-02 12:00:00")
    return df


PROFILES = {
    "empty": _empty,
    "null_keys": _null_keys,
    "unicode_text": _unicode_text,
    "hot_key_skew": _hot_key_skew,
    "constant_ts": _constant_ts,
}


def _build_dir(out_dir: str, transform, rng=None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = papq.read_table(os.path.join(BASE, f"{t}.parquet"))
        # strip pandas metadata so from_pandas round-trips cleanly
        schema = pa.schema(
            [src.schema.field(i) for i in range(len(src.schema.names))]
        )
        df = transform(t, src.to_pandas(), rng)
        out = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        papq.write_table(out, os.path.join(out_dir, f"{t}.parquet"))
    return out_dir


def _run_against_oracles(spark, sf_dir: str, names) -> list[str]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = CHECK.duck_connect(sf_dir)
    failures: list[str] = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001 — recorded, asserted below
            failures.append(f"{name}: spark error: {type(e).__name__}: {e}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: oracle error: {type(e).__name__}: {e}")
            continue
        for p in CHECK.compare(name, sdf, odf):
            failures.append(f"{name}: {p}")
    con.close()
    return failures


@pytest.mark.parametrize("profile", sorted(PROFILES))
def test_shape_profile(spark, tmp_path_factory, profile):
    out = str(tmp_path_factory.mktemp(f"shape_{profile}"))
    _build_dir(out, PROFILES[profile])
    failures = _run_against_oracles(spark, out, SHAPE_QUERIES)
    assert not failures, (
        f"profile {profile!r}: {len(failures)} divergence(s):\n  "
        + "\n  ".join(failures)
    )


# -- hypothesis layer ---------------------------------------------------


@given(
    null_frac=st.integers(0, 3),     # every-nth-row key nulling (0=off)
    skew_mod=st.integers(2, 10),     # 1-in-skew_mod rows KEEP their key
    seed=st.integers(0, 2**16),
)
@settings(
    max_examples=FUZZ_EXAMPLES,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
def test_shape_hypothesis(spark, tmp_path_factory, null_frac, skew_mod, seed):
    rng = np.random.default_rng(seed)

    def transform(name: str, df: pd.DataFrame, _rng) -> pd.DataFrame:
        df = df.copy()
        if name == "events" and len(df):
            hot = int(df["user_id"].min())
            df.loc[df.index % skew_mod != 0, "user_id"] = hot
            if null_frac:
                df.loc[df.index % (null_frac + 2) == 0, "user_id"] = None
        elif name == "documents" and len(df):
            keep = rng.integers(0, 2, size=len(df)).astype(bool)
            pool = _UNICODE_POOL
            df["text"] = [
                t if k else pool[i % len(pool)]
                for i, (t, k) in enumerate(zip(df["text"], keep))
            ]
            if null_frac:
                df.loc[df.index % (null_frac + 3) == 0, "text"] = None
            df["n_chars"] = df["text"].str.len()
        return df

    out = str(tmp_path_factory.mktemp("shape_hyp"))
    _build_dir(out, transform, rng)
    failures = _run_against_oracles(spark, out, CORE_QUERIES)
    assert not failures, (
        f"(null_frac={null_frac}, skew_mod={skew_mod}, seed={seed}): "
        + "; ".join(failures)
    )
