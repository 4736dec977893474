"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169): pick pretraining documents from a
huge raw corpus so their distribution matches a small high-quality
target corpus, using importance weights computed over HASHED N-GRAM
features instead of an expensive model forward pass.

The method, re-expressed Spark-first:

  1. featurize — every document becomes a bag of unigrams + bigrams,
     hashed into `num_buckets` buckets (the paper's 10k-bucket hashed
     feature space).  Pure column expressions: tokenize, zip_with for
     bigrams, md5-based portable bucket hash (the same cross-engine
     hash family the minhash/sampling ops use, so DuckDB can verify
     the whole pipeline value-for-value).
  2. fit — bucket unigram counts under the TARGET distribution
     (documents matching `target_cond`) and under the RAW distribution
     (all documents) in ONE aggregation pass (`count_if` on the flag);
     add-one smoothing gives per-bucket log-likelihood ratios
     log p_target(b) - log p_raw(b).  The fitted table has
     `num_buckets` rows — broadcast-sized at any corpus size.
  3. score — each document's log importance weight is the sum of its
     grams' bucket LLRs: explode, broadcast-join the LLR table, one
     groupBy(doc).  Two shuffles total for fit+score, both on bounded
     keys (bucket ids, doc ids); the corpus is never joined to itself.
  4. resample — Gumbel-top-k gives sampling WITHOUT replacement from
     the softmax of the weights (the paper's resampling step): key =
     log_weight + Gumbel(unit_hash(id, seed)), take the k largest.
     The noise is hash-seeded per row, so a rerun — or a task retry on
     another executor — selects the identical set, unlike
     rand()-based sampling.  `seed=None` degrades to deterministic
     top-k by weight (the "top-k DSIR" ablation in the paper).

At 100 TB: fit and score are each one pass over the corpus with
map-side partial aggregation; the only broadcast state is the
`num_buckets`-row LLR table; top-k plans as TakeOrderedAndProject
(per-partition top-k + driver merge — no global sort exchange).

Reference parity note: the reference engine (src/services/
bigquery.ts) has no data-selection surface; this is part of the
training-data-pipeline pack the build brief asks for beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pixelspark.ops.llm import tokens
from pixelspark.ops.sampling import unit_hash


def hashed_ngram_buckets(text_col: Column | str, num_buckets: int) -> Column:
    """Array of hashed feature-bucket ids (unigrams + bigrams) for one
    document.  Bucket hash is the portable md5 family — first 32 bits
    of md5(gram) mod num_buckets — identical in Spark / DuckDB /
    BigQuery / Trino, so the oracle re-derives the exact buckets."""
    w = tokens(text_col)
    bigrams = F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(w, bigrams)
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % num_buckets,
    )


def dsir_bucket_llr(
    docs: DataFrame,
    target_cond: Column,
    num_buckets: int = 256,
    text_col: str = "text",
    materialize: bool = True,
) -> DataFrame:
    """Fit the hashed-n-gram importance model: per-bucket smoothed
    log-likelihood ratio  log p_target(b) - log p_raw(b), where the
    target distribution is estimated from documents matching
    `target_cond` and the raw distribution from ALL documents.  One
    aggregation pass (target and raw tallied together via count_if);
    output is `num_buckets` rows -> broadcast it onto the scorer.

    `materialize` localCheckpoints the bucket-count table (tiny:
    `num_buckets` rows) so the totals row derives from it WITHOUT
    re-running the corpus aggregation — lazily, `tot` would re-execute
    the whole fit scan, making fit+score three corpus passes instead
    of the minimum two (the same lineage-truncation discipline as
    dedup_clusters' edge table)."""
    ex = docs.select(
        F.coalesce(target_cond, F.lit(False)).alias("is_target"),
        F.explode(hashed_ngram_buckets(text_col, num_buckets)).alias("bucket"),
    )
    counts = ex.groupBy("bucket").agg(
        F.count_if("is_target").cast("long").alias("t_cnt"),
        F.count(F.lit(1)).cast("long").alias("r_cnt"),
    )
    if materialize:
        counts = counts.localCheckpoint(eager=True)
    totals = counts.agg(
        F.sum("t_cnt").cast("long").alias("nt"),
        F.sum("r_cnt").cast("long").alias("nr"),
    )
    b = float(num_buckets)
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_cnt") + 1).cast("double") / (F.col("nt") + F.lit(b)))
            - F.log((F.col("r_cnt") + 1).cast("double") / (F.col("nr") + F.lit(b)))
        ).alias("llr"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_cond: Column,
    num_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document log importance weight: sum of the document's gram
    bucket LLRs (unrounded — callers round at their single compare
    point).  Columns: (id_col, n_grams, log_weight).  Every gram is by
    construction present in the raw counts, so the inner join drops
    nothing.

    Plan (r12 optimization): the exploded gram-bucket stream is
    computed ONCE (lazy localCheckpoint) and feeds both the fit
    aggregation and the scoring join — before this, fit and score
    each ran their own tokenize+md5 explode over the corpus (guide
    §1.2: don't compute things twice).  The fitted LLR table stays
    broadcast-sized (num_buckets rows)."""
    ex = docs.select(
        F.col(id_col),
        F.coalesce(target_cond, F.lit(False)).alias("is_target"),
        F.explode(hashed_ngram_buckets(text_col, num_buckets)).alias("bucket"),
    ).localCheckpoint(eager=False)
    counts = ex.groupBy("bucket").agg(
        F.count_if("is_target").cast("long").alias("t_cnt"),
        F.count(F.lit(1)).cast("long").alias("r_cnt"),
    ).localCheckpoint(eager=False)
    totals = counts.agg(
        F.sum("t_cnt").cast("long").alias("nt"),
        F.sum("r_cnt").cast("long").alias("nr"),
    )
    b = float(num_buckets)
    llr = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_cnt") + 1).cast("double") / (F.col("nt") + F.lit(b)))
            - F.log((F.col("r_cnt") + 1).cast("double") / (F.col("nr") + F.lit(b)))
        ).alias("llr"),
    )
    return (
        ex.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("llr").alias("log_weight"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: int | None = None,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Select k documents from scored weights.  With `seed`, the
    Gumbel-top-k trick samples WITHOUT replacement from the softmax of
    the log weights (the DSIR resampling step), hash-deterministic per
    (seed, id) so reruns and task retries pick the identical set.
    With seed=None, plain deterministic top-k by weight.  Plans as
    TakeOrderedAndProject — no global sort shuffle."""
    if seed is None:
        key = F.col(weight_col)
    else:
        u = unit_hash(id_col, seed)
        key = F.col(weight_col) - F.log(-F.log(u))
    picked = weights.orderBy(key.desc(), F.col(id_col).asc()).limit(k)
    return picked
