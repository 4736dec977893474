"""As-of (point-in-time) join — an operator Spark lacks natively.

Backward as-of semantics: for each left row, attach the single latest
right row of the same key whose timestamp is <= the left timestamp
(SQL: DuckDB/QuestDB ASOF JOIN; kdb aj).

Implementation is the scalable union + carry-forward trick, NOT a
windowed range join or per-key crossJoin:
  1. tag left rows mark=1, right rows mark=0, union them
  2. one window over (key) ordered by (ts, mark) — right rows sort
     before left rows at equal ts, giving <= semantics
  3. last(right_payload, ignorenulls) carries the most recent right
     values forward onto each left row
One shuffle on the key, linear work per partition — survives 100 TB
where a per-pair join would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: left columns + right_payload columns (prefixed
    `asof_`) from the latest right row with right_ts <= left_ts.

    `tolerance_seconds` optionally voids matches older than the
    tolerance (pandas merge_asof parity).
    """
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__mark", F.lit(1))
    for c in right_payload:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("__rt", F.lit(None).cast(right.schema[right_ts].dataType))

    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__mark"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        F.col(right_ts).alias("__rt"),
    )
    for c in lcols:
        if c not in (key,):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l.select(
        key, "__t", "__mark", "__rt", *[c for c in lcols if c != key], *[f"__r_{c}" for c in right_payload]
    ).unionByName(
        r.select(
            key, "__t", "__mark", "__rt", *[c for c in lcols if c != key], *[f"__r_{c}" for c in right_payload]
        )
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__mark").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u
    for c in right_payload:
        carried = carried.withColumn(f"asof_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    carried = carried.withColumn("__asof_t", F.last("__rt", ignorenulls=True).over(w))

    out = carried.where(F.col("__mark") == 1)
    if tolerance_seconds is not None:
        within = (
            F.unix_timestamp(F.col("__t")) - F.unix_timestamp(F.col("__asof_t"))
        ) <= tolerance_seconds
        for c in right_payload:
            out = out.withColumn(
                f"asof_{c}", F.when(within, F.col(f"asof_{c}")).otherwise(F.lit(None))
            )
        out = out.withColumn(
            "__asof_t", F.when(within, F.col("__asof_t")).otherwise(F.lit(None))
        )
    return out.select(
        *lcols,
        *[f"asof_{c}" for c in right_payload],
        F.col("__asof_t").alias("asof_ts"),
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    lo,
    hi,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Interval containment count: per left row, how many right rows of
    the same key fall in [lo, hi].  Equi-join on the key keeps it a
    hash join; the range predicate filters join output (Spark pushes it
    into the join condition)."""
    joined = left.join(
        right,
        (left[key_left] == right[key_right]) & lo & hi,
        "left",
    )
    return joined.groupBy(*[left[c] for c in left.columns]).agg(
        F.count(right[key_right]).alias(count_alias)
    )
