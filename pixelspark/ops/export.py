"""Training-data export: deterministic sharding and JSONL shard
writing — the hand-off surface between the curation pipeline and a
training loader.

Loaders want (a) a FIXED number of shards they can map to workers,
(b) shard membership that never moves between reruns (resumable
preprocessing: shard 17 regenerated bit-identical), and (c) one file
per shard in a self-describing layout.  Sharding therefore uses the
same engine-portable md5 unit hash as the sampling pack (a row's
shard depends only on (seed, key) — never on partitioning, task
retries, or input order), and the writer lays out `shard=K/`
directories with exactly one file each.

Scale shape (100 TB): assignment is a pure projection (no shuffle);
the write's single exchange is `repartition(n_shards, shard)` so each
reduce task streams its shard(s) straight to its directory — no
driver involvement, no post-hoc renaming.  JSONL rows are built with
`to_json(struct(...))`, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pixelspark.ops.sampling import unit_hash


def shard_of(key_col: str, n_shards: int, seed: int = 42) -> Column:
    """Deterministic shard id in [0, n_shards): floor of the portable
    md5 unit hash scaled by the shard count."""
    return F.floor(unit_hash(key_col, seed) * n_shards).cast("int")


def shard_assign(
    df: DataFrame, n_shards: int, key_col: str, seed: int = 42
) -> DataFrame:
    """Adds the `shard` column — disjoint, exhaustive, stable across
    reruns and repartitioning (the property a training loader needs to
    resume preprocessing per-shard)."""
    return df.withColumn("shard", shard_of(key_col, n_shards, seed))


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str,
    seed: int = 42,
    fmt: str = "jsonl",
) -> None:
    """Write `df` as `out_dir/shard=K/` with ONE file per shard.

    jsonl: every row serialized with to_json(struct(<all columns>)) —
    the layout SFT/pretraining loaders consume directly.  parquet:
    same layout, columnar.  The single wide op is the
    repartition(n_shards, shard) exchange; a reduce task owning
    several shard values writes one file into each of their
    directories, so the global invariant stays one-file-per-shard."""
    sharded = shard_assign(df, n_shards, key_col, seed).repartition(
        n_shards, "shard"
    )
    if fmt == "jsonl":
        payload = sharded.select(
            F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
            "shard",
        )
        payload.write.mode("errorifexists").partitionBy("shard").text(out_dir)
    elif fmt == "parquet":
        sharded.write.mode("errorifexists").partitionBy("shard").parquet(out_dir)
    else:
        raise ValueError(f"fmt must be jsonl or parquet, got {fmt!r}")


def shard_manifest(spark: SparkSession, out_dir: str, fmt: str = "jsonl") -> DataFrame:
    """(shard, n_rows, n_bytes, n_files) per shard, from one read of
    the export (file sizes via the hidden _metadata struct — no
    driver-side directory walking)."""
    reader = spark.read.text if fmt == "jsonl" else spark.read.parquet
    scan = reader(out_dir)
    per_file = scan.groupBy(
        "shard",
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.file_size").alias("__sz"),
    ).agg(F.count(F.lit(1)).alias("__rows"))
    return (
        per_file.groupBy("shard")
        .agg(
            F.sum("__rows").cast("long").alias("n_rows"),
            F.sum("__sz").cast("long").alias("n_bytes"),
            F.count(F.lit(1)).cast("int").alias("n_files"),
        )
        .orderBy("shard")
    )
