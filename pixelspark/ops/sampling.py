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


def domain_mixture_rates(
    df: DataFrame,
    domain_col: str,
    target: dict[str, float],
) -> DataFrame:
    """Per-domain keep rates that reshape the corpus to a TARGET domain
    mixture by downsampling only (no replication): the data-mixing step
    every LLM pretraining pipeline runs before tokenization (cf. DoReMi,
    arXiv:2305.10429 — here the closed-form proportional variant, no
    proxy model: given target shares t_d and observed shares p_d, keep
    rate r_d = c * t_d / p_d with c = min_d p_d / t_d, the largest
    scaling for which every rate <= 1).  The expected post-sample share
    of domain d is then exactly t_d, and the scarcest-relative-to-target
    domain is kept whole (rate 1.0).

    Scale shape: one COUNT(*) GROUP BY over the corpus (partial-agg,
    one shuffle of |domains| rows), then all arithmetic on the
    domain-sized relation — two 1-row aggregates broadcast back with
    crossJoin, never a driver collect of data rows.  Domains absent
    from `target` get no row (callers drop them); a target domain
    absent from the corpus contributes nothing to c (its rate would be
    unsatisfiable) and yields no row.

    Returns (domain, n_docs, obs_share, keep_rate) — shares and rates
    as doubles from integer-count arithmetic, so the DuckDB oracle
    reproduces them bit-for-bit when it mirrors the operation order.
    """
    if not target:
        raise ValueError("target mixture must be non-empty")
    doms = sorted(target)
    tmap = F.create_map(
        *[x for d in doms for x in (F.lit(d), F.lit(float(target[d])))]
    )
    counts = (
        df.where(F.col(domain_col).isin(doms))
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("t_share", tmap[F.col("domain")])
    )
    total = counts.agg(F.sum("n_docs").cast("double").alias("_n_total"))
    counts = counts.crossJoin(F.broadcast(total)).withColumn(
        "obs_share", F.col("n_docs").cast("double") / F.col("_n_total")
    )
    c = counts.agg(
        F.min(F.col("obs_share") / F.col("t_share")).alias("_c")
    )
    return (
        counts.crossJoin(F.broadcast(c))
        .select(
            "domain",
            "n_docs",
            "obs_share",
            F.least(
                F.lit(1.0),
                F.col("_c") * F.col("t_share") / F.col("obs_share"),
            ).alias("keep_rate"),
        )
    )


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    target: dict[str, float],
    key_col: str,
    seed: int = 11,
) -> DataFrame:
    """Downsample the corpus to the target domain mixture: broadcast
    the domain-sized rate table from `domain_mixture_rates` onto the
    corpus and keep rows where the deterministic per-row unit hash
    falls under the domain's keep rate.  Hash-deterministic like every
    sampler here — rerun/retry-stable and oracle-checkable — and the
    corpus-side plan is a broadcast-join + filter (no extra shuffle)."""
    rates = domain_mixture_rates(df, domain_col, target).select(
        F.col("domain").alias(f"__{domain_col}"), "keep_rate"
    )
    return (
        df.join(
            F.broadcast(rates), F.col(domain_col) == F.col(f"__{domain_col}")
        )
        .where(unit_hash(key_col, seed) < F.col("keep_rate"))
        .drop(f"__{domain_col}", "keep_rate")
    )


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
