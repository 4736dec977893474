"""Sampling ops for training-data pipelines: stratified sampling,
seeded train/val/test splits, and weighted corpus mixtures.

All are seed-deterministic per row (hash-based, not RNG-state-based):
the split a row lands in depends only on (seed, row key), so a rerun —
or a task retry on a different executor — assigns every row
identically.  This is the property `randomSplit` does NOT guarantee
under repartitioning, and it is what makes splits reproducible at
100 TB.

The unit hash is md5-based (first 8 hex chars -> uint32 -> [0,1)):
md5 exists in every engine, so the exact same sample is computable in
DuckDB/BigQuery/Trino for cross-system verification — the driver's
oracle checks the sampled sets value-for-value.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def unit_hash(key_col: str, seed: int) -> Column:
    """Deterministic uniform [0,1) from (key, seed), portable across
    engines: first 32 bits of md5('<key>|<seed>')."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"|{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def unit_hash_sql(key_expr: str, seed: int) -> str:
    """The DuckDB-equivalent expression (used by oracle SQL)."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '|{seed}'), 1, 8)) "
        f"AS UBIGINT) / 4294967296.0"
    )


def _stable_name_offset(name: str) -> int:
    """Per-source seed offset — md5-based, NOT python hash() (which is
    salted per process and would make mixtures unreproducible)."""
    return int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % 1000


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling with exact per-row determinism: row kept iff
    unit_hash(seed, key) < fraction(stratum).  Unlisted strata are
    dropped (fraction 0)."""
    frac = None
    for value, f in fractions.items():
        cond = F.when(F.col(strata_col) == value, F.lit(float(f)))
        frac = cond if frac is None else frac.when(F.col(strata_col) == value, F.lit(float(f)))
    frac = (frac.otherwise(F.lit(0.0))) if frac is not None else F.lit(0.0)
    return df.where(unit_hash(key_col, seed) < frac)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 42,
) -> DataFrame:
    """Adds a `split` column ('train'/'val'/'test') by hashed key —
    disjoint, exhaustive, and stable across reruns and repartitioning."""
    w_train, w_val, _ = weights
    u = unit_hash(key_col, seed)
    return df.withColumn(
        "split",
        F.when(u < w_train, "train").when(u < w_train + w_val, "val").otherwise("test"),
    )


def corpus_mixture(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Weighted mixture of corpora: sample each source at its weight
    (hash-deterministic), tag provenance, union.  The downsampling
    happens before the union so no source is materialized whole."""
    parts = []
    for name, df in sources.items():
        w = float(weights.get(name, 0.0))
        if w <= 0:
            continue
        part = df.where(unit_hash(key_col, seed + _stable_name_offset(name)) < w).withColumn(
            "mixture_source", F.lit(name)
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def group_topk_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Exactly-k-per-group uniform sample (fewer if the group is
    smaller): rank rows within each group by a deterministic unit
    hash of the key and keep the first k.

    Complements `stratified_sample` (fraction-based, no size
    guarantee): this is the "give me exactly 1000 examples per
    language" sampler.  Engine-portable determinism comes from the
    md5-based `unit_hash` (ties impossible for distinct keys);
    `WindowGroupLimit` pre-prunes each map task to k candidates per
    group before the shuffle, so the exchange carries ~k*groups rows
    per task, not the whole fact."""
    w = Window.partitionBy(group_col).orderBy(
        unit_hash(key_col, seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
