"""DSIR importance-resampling tests: weight semantics on a corpus with
a known target signal, hash-determinism under repartitioning, and the
Gumbel-top-k resampling properties (reproducible per seed, weight-
monotone in aggregate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixelspark.ops.dsir import (
    dsir_bucket_llr,
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_buckets,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # target-looking docs share the "clean prose" vocabulary; raw noise
    # docs use a disjoint vocabulary — DSIR must rank target-like docs
    # above noise docs by a wide margin.
    rows = []
    for i in range(10):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "tgt"))
    for i in range(10, 20):
        rows.append((i, "zzz qqq xxx vvv kkk jjj www yyy uuu ttt", "raw"))
    # held-out docs: 20 target-like, 21 noise-like, neither in target set
    rows.append((20, "the quick brown fox naps under the lazy dog", "held"))
    rows.append((21, "zzz qqq xxx vvv kkk naps jjj www yyy uuu", "held"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_bucket_arrays_include_bigrams(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    n = df.select(F.size(hashed_ngram_buckets("text", 64)).alias("n")).collect()[0]["n"]
    assert n == 5  # 3 unigrams + 2 bigrams
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    n1 = one.select(F.size(hashed_ngram_buckets("text", 64)).alias("n")).collect()[0]["n"]
    assert n1 == 1  # no bigram leg on a 1-token doc


def test_llr_favors_target_vocabulary(spark, corpus):
    llr = dsir_bucket_llr(corpus, F.col("kind") == "tgt", num_buckets=512)
    w = dsir_log_weights(corpus, F.col("kind") == "tgt", num_buckets=512)
    got = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    # every target doc outranks every noise doc; held-out target-alike
    # outranks held-out noise-alike
    assert min(got[i] for i in range(10)) > max(got[i] for i in range(10, 20))
    assert got[20] > got[21]
    # LLR table is bounded by the bucket count
    assert llr.count() <= 512


def test_weights_deterministic_under_repartition(spark, corpus):
    cond = F.col("kind") == "tgt"
    a = dsir_log_weights(corpus, cond, num_buckets=128)
    b = dsir_log_weights(corpus.repartition(7), cond, num_buckets=128)
    ga = {r["doc_id"]: round(r["log_weight"], 9) for r in a.collect()}
    gb = {r["doc_id"]: round(r["log_weight"], 9) for r in b.collect()}
    assert ga == gb


def test_gumbel_resample_reproducible_and_seed_sensitive(spark, corpus):
    w = dsir_log_weights(corpus, F.col("kind") == "tgt", num_buckets=512)
    s1 = {r["doc_id"] for r in dsir_resample(w, k=8, seed=1).collect()}
    s1b = {r["doc_id"] for r in dsir_resample(w, k=8, seed=1).collect()}
    assert s1 == s1b  # hash-seeded: a rerun picks the identical set
    assert len(s1) == 8
    # across seeds, target-like docs dominate the selection: their
    # weights are far above the noise docs', so the Gumbel perturbation
    # (scale ~1) cannot overturn the gap in aggregate
    hits = 0
    for seed in range(5):
        sel = {r["doc_id"] for r in dsir_resample(w, k=8, seed=seed).collect()}
        hits += len(sel & (set(range(10)) | {20}))
    assert hits >= 35  # >= 7 of 8 target-like per draw on average


def test_topk_resample_matches_weight_order(spark, corpus):
    w = dsir_log_weights(corpus, F.col("kind") == "tgt", num_buckets=512)
    top = dsir_resample(w, k=11, seed=None).collect()
    assert {r["doc_id"] for r in top} == set(range(10)) | {20}


def test_registry_queries_run(spark, sf_dir):
    from pixelspark.queries import QUERIES

    w = QUERIES["q_dsir_weights"](spark, sf_dir)
    assert w.columns == ["doc_id", "n_grams", "log_weight"]
    n_docs = w.count()
    assert n_docs > 0
    sel = QUERIES["q_dsir_select"](spark, sf_dir).collect()
    assert len(sel) == min(20, n_docs)
    ranks = [r["rank"] for r in sel]
    assert sorted(ranks) == list(range(1, len(sel) + 1))
    ws = [r["log_weight"] for r in sorted(sel, key=lambda r: r["rank"])]
    assert ws == sorted(ws, reverse=True)


def test_fit_scan_runs_once_in_score_plan(spark, sf_dir):
    """Fit and score share ONE materialized gram-bucket stream (r12:
    the exploded stream is localCheckpointed and feeds both), so the
    scoring plan re-reads the checkpoint — at most one corpus
    FileScan may remain anywhere in the final plan (zero when the
    shared stream covers both passes; three when the fit ran lazily
    per consumer, the regression this test pins against)."""
    from pixelspark.queries import QUERIES

    plan = (
        QUERIES["q_dsir_weights"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") <= 1, plan[:2000]
    # the shared stream itself must be present (both aggregate legs
    # read the checkpointed RDD, not fresh scans)
    assert "Scan ExistingRDD" in plan, plan[:2000]
