"""Pipeline observability: `df.observe` attaches aggregate metrics
(row counts, sums, null rates) that are computed ON THE EXECUTORS as a
side effect of the action already running — zero extra passes, zero
extra shuffles.  The 100-TB alternative (a separate `.count()` /
`.agg()` per metric) re-reads the table once per metric; `observe`
piggybacks on the job you were going to run anyway.

The reference logs per-run record counts around every BigQuery batch
(services/billing.ts:170-176 console summaries); this is that audit
trail done inside the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metrics to a DataFrame; read `obs.get` after the
    first action completes.  Default metric set when none given:
    row count."""
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("rows"),)
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def billing_run_metrics(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Audit metrics for a billing-run output: row count, total views,
    total billed amount, and zero-amount row count (the reference's
    skip-charge set, shopifyBilling.ts:68-74)."""
    return observed(
        df,
        "billing_run",
        F.count(F.lit(1)).alias("rows"),
        F.sum("page_views").alias("total_views"),
        F.round(F.sum("billing_amount"), 2).alias("total_amount"),
        F.count_if(F.col("billing_amount") <= 0.0).alias("zero_amount_rows"),
    )
