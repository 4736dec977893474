"""Mergeable-summary operators: exact distinct counting via bitmap
partials, and approximate heavy hitters via approx_top_k.

Why bitmaps next to the HLL pack (queries.py q_hll_sketch): HLL
partials are mergeable but approximate; Spark's bitmap aggregate
family (bitmap_bucket_number / bitmap_bit_position /
bitmap_construct_agg / bitmap_or_agg / bitmap_count) gives EXACT
distinct counts that are still mergeable — per-partition (or per-day)
partial bitmaps OR-merge associatively, so a 100-TB rollup can keep
per-segment bitmap partials and re-aggregate to any coarser grain
without rescanning the fact (the same re-aggregation contract as the
continuous-aggregate rollup in ops/rollup.py, but for COUNT(DISTINCT),
which plain counters cannot re-aggregate).

The reference has no sketch surface (its BigQuery tier computes
COUNT(DISTINCT) exactly, see /root/reference/src/services/bigquery.ts
query path); this pack is engine surface the brief's 100-TB posture
requires.

Scale notes:
  * bitmap partials are fixed-width (4 KB per 32768-id bucket), so the
    shuffle for the merge moves #groups x #occupied-buckets x 4 KB, not
    one row per distinct id — strictly less data than shuffling raw ids
    whenever ids repeat across partitions.
  * ids must be non-negative integers (bitmap_bit_position is the
    id's offset inside its bucket); hash non-integer keys to ids first
    (e.g. xxhash64 -> pmod) accepting the collision rate, or keep a
    dictionary dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bitmap_distinct(df: DataFrame, group_cols: list[str], id_col: str) -> DataFrame:
    """Exact COUNT(DISTINCT id_col) per group via mergeable bitmaps.

    Two-level plan: map ids to (bucket, bit); build one bitmap per
    (group, bucket) — this is the only wide shuffle, and its payload is
    fixed-width bitmaps built map-side by partial aggregation; then sum
    per-bucket cardinalities per group (second agg is #groups x
    #buckets rows, tiny).  Equivalent to COUNT(DISTINCT) but
    pre-aggregatable: the per-bucket bitmaps can be stored and
    OR-merged later (see merge_bitmap_partials).
    """
    partials = (
        df.select(
            *group_cols,
            F.bitmap_bucket_number(F.col(id_col)).alias("_bucket"),
            F.bitmap_bit_position(F.col(id_col)).alias("_pos"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.bitmap_construct_agg(F.col("_pos")).alias("_bm"))
    )
    return (
        partials.groupBy(*group_cols)
        .agg(F.sum(F.bitmap_count(F.col("_bm"))).alias("distinct_count"))
    )


def bitmap_partials(df: DataFrame, group_cols: list[str], id_col: str) -> DataFrame:
    """Materializable per-(group, bucket) bitmap partials — the stored
    form of an incrementally-maintained distinct-count rollup."""
    return (
        df.select(
            *group_cols,
            F.bitmap_bucket_number(F.col(id_col)).alias("bucket"),
            F.bitmap_bit_position(F.col(id_col)).alias("pos"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bitmap"))
    )


def merge_bitmap_partials(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """OR-merge stored bitmap partials to a coarser grain and count.

    `partials` has columns group_cols + finer grain cols + (bucket,
    bitmap); any finer-grain columns not in group_cols are merged away.
    bitmap_or_agg is associative/commutative/idempotent, so partials
    may overlap (e.g. a replayed day) without overcounting — the same
    idempotence argument as a set union.
    """
    return (
        partials.groupBy(*group_cols, "bucket")
        .agg(F.bitmap_or_agg(F.col("bitmap")).alias("bitmap"))
        .groupBy(*group_cols)
        .agg(F.sum(F.bitmap_count(F.col("bitmap"))).alias("distinct_count"))
    )


def approx_top_k(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 5
) -> DataFrame:
    """Approximate per-group heavy hitters (item, estimated count).

    Spark's approx_top_k aggregate keeps a bounded sketch per group
    (maxItemsTracked slots), so memory is O(groups x slots) regardless
    of input size; exact per-group top-k would need a full
    (group, value) count shuffle first.  Result rows are exploded to
    (group, item, est_count, rank) for a stable relational shape.
    """
    agged = df.groupBy(*group_cols).agg(
        F.expr(f"approx_top_k({value_col}, {k})").alias("_topk")
    )
    return agged.select(
        *group_cols,
        F.posexplode(F.col("_topk")).alias("rank", "_entry"),
    ).select(
        *group_cols,
        (F.col("rank") + 1).alias("rank"),
        F.col("_entry.item").alias("item"),
        F.col("_entry.count").cast("long").alias("est_count"),
    )


def inlist_pushdown_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    max_keys: int = 100_000,
) -> DataFrame:
    """Exact join with a manual IN-list pushdown on the fact side.

    Collects the (filtered) dim keyset to the driver and pushes an
    isin() predicate into the FACT'S PARQUET SCAN (`PushedFilters:
    In(fact_key, [...])`), then runs the exact equi-join.  The isin
    prefilter keeps exactly the matching rows, so the result is
    value-identical to the plain join — that equivalence is this
    query's oracle.

    This is the manual row-level counterpart of dynamic partition
    pruning for NON-partition columns, and stronger than Catalyst's
    runtime Bloom join (tests/test_plans.py::
    test_runtime_bloom_filter_join): the Bloom filter evaluates after
    the scan, while the IN list prunes row groups via column min/max
    stats before decoding.  The cost is the driver collect — gated by
    max_keys, so apply it only when the dim side is known-selective
    (here: LIMIT max_keys+1 and a hard error rather than a silent
    mis-scale; at 100 TB a 10^5-key IN list is fine, a 10^8 one is
    not — fall back to the plain shuffle join or Bloom above that).
    """
    keys = [
        r[0] for r in dim.select(dim_key).distinct().limit(max_keys + 1).collect()
    ]
    if len(keys) > max_keys:
        raise ValueError(
            f"inlist_pushdown_join: dim keyset exceeds max_keys={max_keys}; "
            "use a shuffle join instead"
        )
    pre = fact.where(F.col(fact_key).isin(keys))
    return pre.join(F.broadcast(dim), pre[fact_key] == dim[dim_key])
