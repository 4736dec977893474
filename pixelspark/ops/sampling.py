"""Sampling ops for training-data pipelines: stratified sampling,
seeded train/val/test splits, and weighted corpus mixtures.

All are seed-deterministic per row (hash-based, not RNG-state-based):
the split a row lands in depends only on (seed, row key), so a rerun —
or a task retry on a different executor — assigns every row
identically.  This is the property `randomSplit` does NOT guarantee
under repartitioning, and it is what makes splits reproducible at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit_hash(key_col: str, seed: int):
    """Deterministic uniform [0,1) from (seed, key) — xxhash64 bits."""
    h = F.xxhash64(F.col(key_col), F.lit(seed))
    # map signed 64-bit to [0,1): shift to unsigned range then scale
    return (h.cast("double") / F.lit(float(2**64))) + F.lit(0.5)


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
    return df.where(_unit_hash(key_col, seed) < frac)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 42,
) -> DataFrame:
    """Adds a `split` column ('train'/'val'/'test') by hashed key —
    disjoint, exhaustive, and stable across reruns and repartitioning."""
    w_train, w_val, _ = weights
    u = _unit_hash(key_col, seed)
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
        part = df.where(_unit_hash(key_col, seed + hash(name) % 1000) < w).withColumn(
            "mixture_source", F.lit(name)
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
