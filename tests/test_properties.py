"""Property-based tests (hypothesis): billing-math rounding parity with
the reference's JS semantics, normalization idempotence."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st


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
def test_normalize_text_idempotent(spark, s):
    from pyspark.sql import functions as F

    from pixelspark.ops.llm import normalize_text

    df = spark.createDataFrame([(s,)], "t string")
    once = df.select(normalize_text("t").alias("n"))
    twice = once.select(normalize_text("n").alias("n"))
    assert once.collect()[0]["n"] == twice.collect()[0]["n"]
