"""Window-function pack (SURVEY.md §2.5 + analytic extensions).

W1 latest-row-per-key lives in io.latest_state (it is the read side of
the storage pattern); this module holds the analytic helpers the
queries compose.  All are thin Window builders — the value is the
documented, reusable shape (partition keys first, deterministic
tiebreaks always).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pixelspark.io import latest_state  # re-export: W1 (noqa: F401)

__all__ = [
    "latest_state",
    "top_n",
    "top_n_per_group",
    "running_total",
    "day_over_day",
    "moving_avg",
    "gap_fill_days",
]


def top_n(df: DataFrame, order_col: str, n: int, tiebreak: str) -> DataFrame:
    """W2/L2 — global top-N with a deterministic tiebreak; compiles to
    TakeOrderedAndProject (no full sort)."""
    return df.orderBy(F.col(order_col).desc(), F.col(tiebreak).asc()).limit(n)


def top_n_per_group(
    df: DataFrame, group_col: str, order_col: str, n: int, tiebreak: str
) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
        .drop("__rk")
    )


def running_total(
    df: DataFrame, order_col: str, value_col: str, alias: str = "running_total"
) -> DataFrame:
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, F.sum(value_col).over(w).cast("long"))


def day_over_day(
    df: DataFrame, order_col: str, value_col: str
) -> DataFrame:
    w = Window.orderBy(order_col)
    return df.withColumn("prev_n", F.lag(value_col).over(w)).withColumn(
        "delta", F.col(value_col) - F.lag(value_col).over(w)
    )


def moving_avg(
    df: DataFrame, order_col: str, value_col: str, window_rows: int = 7, alias: str = "ma"
) -> DataFrame:
    w = Window.orderBy(order_col).rowsBetween(-(window_rows - 1), Window.currentRow)
    return df.withColumn(alias, F.round(F.avg(value_col).over(w), 6))


def gap_fill_days(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_cols: tuple[str, ...],
    fill: str = "ffill",
) -> DataFrame:
    """Time-series resample-to-daily with gap fill — an operator Spark
    has no built-in for (pandas reindex+ffill equivalent), composed
    from built-ins:

      1. per key, generate the full day range (sequence + explode —
         the row count is bounded by keys x days, independent of the
         source row distribution);
      2. left-join the observed rows back on (key, day);
      3. forward-fill each value with last(ignoreNulls) over an
         unbounded-preceding window.

    One shuffle on the key (the join and the window share the
    (key, day) clustering, so Spark plans a single exchange).  'ffill'
    carries the last observation; 'zero' fills 0.0 — both leave
    observed rows untouched."""
    from pyspark.sql import Window

    days = (
        df.groupBy(key_col)
        .agg(F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1"))
        .select(
            key_col,
            F.explode(F.sequence("__d0", "__d1", F.expr("INTERVAL 1 DAY"))).alias(
                day_col
            ),
        )
    )
    obs = df.withColumn("is_observed", F.lit(True))
    out = days.join(obs, [key_col, day_col], "left").withColumn(
        "is_observed", F.coalesce("is_observed", F.lit(False))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        if fill == "ffill":
            out = out.withColumn(v, F.last(v, ignorenulls=True).over(w))
        elif fill == "zero":
            out = out.withColumn(v, F.coalesce(F.col(v), F.lit(0.0)))
        else:
            raise ValueError(f"unknown fill {fill!r}")
    return out


def scd2(
    changes: DataFrame,
    keys: tuple[str, ...],
    order_col: str,
    end_of_time: str = "2200-01-01 00:00:00",
) -> DataFrame:
    """Build a slowly-changing-dimension Type 2 view from a change log:
    each version row gets [valid_from, valid_to) from its own change
    time to the next change of the same key (lead over the key
    window), open versions get the sentinel end-of-time, and
    is_current flags the newest row per key.

    This is the queryable form of the reference's append-as-update
    billing log (billing.ts:161-163): `latest_state` answers "what is
    true now", scd2 answers "what was true at time T" — the
    point-in-time read is then a plain BETWEEN filter (or an as-of
    join from ops/asof.py).  One window pass over (keys, order_col):
    a single shuffle, no self-join."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).asc())
    nxt = F.lead(order_col).over(w)
    return (
        changes.withColumn("valid_from", F.col(order_col))
        .withColumn(
            "valid_to", F.coalesce(nxt, F.lit(end_of_time).cast("timestamp"))
        )
        .withColumn("is_current", nxt.isNull())
    )


def ewma(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average over the rows in
    `order_col` order (the pandas `ewm(adjust=False)` recurrence:
    y_0 = x_0, y_t = (1-a) y_{t-1} + a x_t), emitted for EVERY row.

    The recurrence is sequential per key, which no built-in window
    frame expresses (weights depend on distance, and the naive
    closed-form sum overflows (1-a)^-t for long series), so each key's
    ordered series runs through ONE Arrow-batched kernel via
    applyInPandas — state never leaves the executor and the shuffle is
    the same single hash partition-by-key any windowed aggregate pays.
    Keys must fit a task's memory (same contract as any per-key
    window)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    def kernel(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    return df.groupBy(*keys).applyInPandas(kernel, schema)
