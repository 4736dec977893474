"""Property-based tests (hypothesis): billing-math rounding parity with
the reference's JS semantics, normalization idempotence."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
import pytest


def js_math_round_2dp(x: float) -> float:
    """Reference: Math.round(pv/1e6*rate*100)/100 (billing.ts:276-280).
    JS Math.round is floor(x+0.5) — half-up for positives."""
    return math.floor(x * 100 + 0.5) / 100


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000_000))
def test_amount_half_up_parity(pv):
    """Python reimplementation of the Spark ROUND(x,2) HALF_UP path must
    equal the JS rounding for every non-negative page-view count (the
    Spark<->oracle equality itself is covered by the oracle sweep)."""
    import decimal

    x = pv / 1_000_000 * 10.0
    spark_like = float(
        decimal.Decimal(repr(x)).quantize(decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP)
    )
    assert spark_like == js_math_round_2dp(x)


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80))
@pytest.mark.slow  # deep end-to-end matrix: certification tier (r13; pytest.ini)
def test_normalize_text_idempotent(spark, s):
    from pyspark.sql import functions as F

    from pixelspark.ops.llm import normalize_text

    df = spark.createDataFrame([(s,)], "t string")
    once = df.select(normalize_text("t").alias("n"))
    twice = once.select(normalize_text("n").alias("n"))
    assert once.collect()[0]["n"] == twice.collect()[0]["n"]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120),
        min_size=1,
        max_size=8,
    )
)
def test_doc_chunks_python_parity(spark, texts):
    """Chunking must equal the plain-Python sliding window for any
    ASCII input: same chunk count, offsets, lengths, fingerprints."""
    import hashlib

    from pixelspark.ops.llm import doc_chunks

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_len"], r["chunk_fp"])
        for r in doc_chunks(df, size=50, stride=30).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for ci, start in enumerate(range(1, max(len(t), 1) + 1, 30)):
            piece = t[start - 1 : start - 1 + 50]
            want[(i, ci)] = (start, len(piece), hashlib.md5(piece.encode()).hexdigest())
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=100),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow  # deep end-to-end matrix: certification tier (r13; pytest.ini)
def test_sequence_pack_python_parity(spark, texts):
    """Packing offsets must equal the plain-Python cumulative sum of
    whitespace token counts in doc_id order."""
    from pixelspark.ops.llm import sequence_pack

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["first_seq"], r["last_seq"])
        for r in sequence_pack(df, budget_tokens=7).collect()
    }
    offset = 0
    for i, t in enumerate(texts):
        n = len(t.split())
        end = offset + max(n - 1, 0)
        assert got[i] == (n, offset, offset // 7, end // 7)
        offset += n


@settings(max_examples=15, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80))
@pytest.mark.slow  # deep end-to-end matrix: certification tier (r13; pytest.ini)
def test_pii_redact_idempotent(spark, s):
    """Redaction must be a fixpoint: the replacement tokens can never
    re-match the PII patterns."""
    from pyspark.sql import functions as F

    from pixelspark.ops.llm import pii_redact

    df = spark.createDataFrame(
        [(s + " a.b@ex.com x +1-415-555-0000",)], "t string"
    )
    once = df.select(pii_redact("t").alias("r"))
    twice = once.select(pii_redact("r").alias("r"))
    a, b = once.collect()[0]["r"], twice.collect()[0]["r"]
    assert a == b
    assert "<EMAIL>" in a and "<PHONE>" in a
