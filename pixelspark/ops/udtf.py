"""Python user-defined table functions (Spark 3.5+ `@udtf`).

A UDTF is the one-row-in / many-rows-out extension point — the Python
analog of the reference's per-record expansion loops (e.g. walking a
record's line items in JS, shopifyBilling.ts:81-140).  It is a
row-at-a-time PYTHON path: at 100 TB use it only where the expansion
logic genuinely cannot be expressed with `explode`/`posexplode` over
built-in array functions (which stay JVM-side and are checked
equivalent in tests/test_scalar.py).  The lateral-join form
`FROM t, LATERAL fn(t.col)` parallelizes per-partition like any
narrow map — no shuffle, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word: string, pos: int")
class TokenizeWords:
    """Whitespace word-splitter with 1-based ordinal — the canonical
    many-rows-out shape (doc -> one row per token)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        pos = 0
        for w in text.split():
            pos += 1
            yield w, pos


def register_udtfs(spark: SparkSession) -> None:
    """Register every engine UDTF on the session (idempotent)."""
    spark.udtf.register("tokenize_words", TokenizeWords)
