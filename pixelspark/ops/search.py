"""Corpus search primitives: inverted index construction and BM25
ranking — the retrieval layer a training-data pipeline needs for
corpus exploration, contamination checks, and quality-weighted
sampling by query relevance.

No reference counterpart (the reference is a billing batch engine);
these extend the LLM-pipeline pack over the `documents` table.

Scale posture (100 TB): the token stream is the only fact-scale
relation.  Both operators shuffle it exactly once on a compact key
((token) for the index, (doc_id) for scoring); every statistics
relation (document frequency, corpus size, average doc length) is
vocabulary-sized or scalar and broadcasts.  Posting lists for
stopword-grade tokens are the one unbounded output — `min_df` /
`max_df` bounds them, mirroring how production indexes drop or
tier stopwords.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pixelspark.ops.llm import tokens


def doc_token_stream(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tok) one row per token OCCURRENCE (duplicates kept —
    term frequency is derivable; callers dedup when they only need
    presence)."""
    return docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok"))


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """token -> (doc_count, postings) where postings is the sorted,
    comma-joined doc-id list.

    Plan: explode -> distinct(doc, token) -> groupBy(token), i.e. two
    shuffles on compact pairs, with map-side partial aggregation on
    both.  At 100 TB the df bounds matter: a stopword's posting list
    is "every doc" — `max_df` drops such terms (they carry no
    retrieval signal), `min_df` drops hapax noise.
    """
    presence = doc_token_stream(docs, text_col, id_col).distinct()
    idx = presence.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ",",
        ).alias("postings"),
    )
    idx = idx.where(F.col("doc_count") >= min_df)
    if max_df is not None:
        idx = idx.where(F.col("doc_count") <= max_df)
    return idx.select(F.col("tok").alias("token"), "doc_count", "postings")


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 3,
) -> DataFrame:
    """BM25 relevance of every document containing >=1 query term.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with the Robertson/Sparck-Jones idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)
    (the Lucene variant — always positive).

    Plan shape: one fact-scale aggregate computes per-doc length
    (shuffle on doc_id); term frequencies for the query terms are a
    FILTERED aggregate of the same stream (the `tok IN (...)`
    predicate collapses it to matching docs only before the shuffle).
    df-per-term and (N, avgdl) are term-count-sized / scalar and
    broadcast.  No top-k LIMIT: the full scored set is returned so
    the result is a deterministic set (float-tie top-k ordering is
    not portable across engines); callers rank downstream.
    """
    stream = doc_token_stream(docs, text_col, id_col)
    dl = stream.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tf = (
        stream.where(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    )
    contrib = idf * F.col("tf") * (F.lit(k1) + 1.0) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), round_dp).alias("bm25"))
    )
