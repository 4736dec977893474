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
