"""Training-shard export: deterministic assignment, one-file-per-shard
layout, JSONL round-trip, manifest accounting."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pixelspark.ops.export import (
    export_training_shards,
    shard_assign,
    shard_manifest,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )


def test_shard_assign_deterministic_and_exhaustive(spark):
    d = _docs(spark)
    a = shard_assign(d, 8, "doc_id")
    b = shard_assign(d.repartition(13), 8, "doc_id")  # partitioning changed
    assert (
        a.select("doc_id", "shard").exceptAll(b.select("doc_id", "shard")).count()
        == 0
    )
    shards = [r["shard"] for r in a.select("shard").distinct().collect()]
    assert all(0 <= s < 8 for s in shards)
    assert a.count() == 200  # nothing dropped


def test_export_jsonl_one_file_per_shard_and_roundtrip(spark, tmp_path):
    out = str(tmp_path / "export")
    export_training_shards(_docs(spark), out, n_shards=4, key_col="doc_id")
    # layout: shard=K dirs, exactly one data file each
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(4)]
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d))
                 if not f.startswith(("_", "."))]
        assert len(files) == 1, (d, files)
        # each line is a self-contained JSON object with the row's cols
        with open(os.path.join(out, d, files[0])) as fh:
            row = json.loads(fh.readline())
        assert set(row) == {"doc_id", "text"}
    # round-trip: all 200 docs, none duplicated
    back = spark.read.json(out)
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200


def test_shard_manifest_counts_match(spark, tmp_path):
    out = str(tmp_path / "export2")
    export_training_shards(_docs(spark, 300), out, n_shards=5, key_col="doc_id")
    mani = {r["shard"]: r for r in shard_manifest(spark, out).collect()}
    direct = {
        r["shard"]: r["n"]
        for r in shard_assign(_docs(spark, 300), 5, "doc_id")
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {s: m["n_rows"] for s, m in mani.items()} == direct
    assert all(m["n_files"] == 1 and m["n_bytes"] > 0 for m in mani.values())


def test_export_parquet_variant(spark, tmp_path):
    out = str(tmp_path / "export3")
    export_training_shards(
        _docs(spark), out, n_shards=3, key_col="doc_id", fmt="parquet"
    )
    back = spark.read.parquet(out)
    assert back.count() == 200 and "shard" in back.columns
    mani = shard_manifest(spark, out, fmt="parquet")
    assert mani.count() == 3


def test_export_bad_fmt_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="fmt"):
        export_training_shards(
            _docs(spark), str(tmp_path / "x"), 2, "doc_id", fmt="csv"
        )
