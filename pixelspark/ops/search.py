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

    Plan shape (r13; guide §1.2/§2.3 — aggregate before you shuffle,
    one corpus pass): a SINGLE fact-scale aggregation on doc_id
    computes the per-doc length AND one conditional-count column per
    query term in the same map-side-partial pass; the query terms are
    a tiny literal list, so the extra columns are a handful of longs
    per doc.  That doc-sized relation is materialized once and feeds
    everything: (avgdl, N) as a scalar aggregate, per-term df and the
    scoring rows via an in-row unpivot (no join needed to re-attach
    dl — it already rides the row).  r12 ran TWO full token-stream
    aggregations (dl, tf) plus a dl⋈tf shuffle join; all of that is
    now one shuffle of (doc_id) partial aggregates.  No top-k LIMIT:
    the full scored set is returned so the result is a deterministic
    set (float-tie top-k ordering is not portable across engines);
    callers rank downstream.
    """
    uniq = list(dict.fromkeys(terms))
    if not uniq:
        return docs.select(F.col(id_col).alias("doc_id")).limit(0).select(
            "doc_id", F.lit(None).cast("double").alias("bm25")
        )
    stream = doc_token_stream(docs, text_col, id_col)
    per_doc = stream.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.count(F.when(F.col("tok") == F.lit(t), 1))
            .cast("long")
            .alias(f"__tf_{i}")
            for i, t in enumerate(uniq)
        ],
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    pairs = F.array(
        *[
            F.struct(F.lit(t).alias("tok"), F.col(f"__tf_{i}").alias("tf"))
            for i, t in enumerate(uniq)
        ]
    )
    tf = (
        per_doc.select("doc_id", "dl", F.explode(pairs).alias("p"))
        .select("doc_id", "dl", F.col("p.tok").alias("tok"), F.col("p.tf").alias("tf"))
        .where(F.col("tf") > 0)
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
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), round_dp).alias("bm25"))
    )


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vec_id: int = 0,
    n_each: int = 50,
    k: int = 20,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 top-`n_each` and the
    cosine top-`n_each` lists with Reciprocal Rank Fusion
    (Cormack/Clarke/Buettcher SIGIR'09):

        rrf(d) = sum over lists of 1 / (rrf_k + rank_in_list(d))

    with absent-from-list contributing 0.  RRF is the standard
    score-scale-free way to combine lexical and dense retrieval —
    ranks, not raw scores, so no per-list normalization is needed.

    Scale shape: each list is produced by `orderBy().limit(n_each)` —
    Spark plans TakeOrderedAndProject (per-partition top-N, merge on
    the driver), never a global sort; the subsequent row_number windows
    and the full-outer fuse run over <= n_each rows each.  Ranks order
    by the ROUNDED score with the id as tiebreak so the lists (and
    therefore the fusion) are deterministic and engine-portable.
    """
    from pyspark.sql.window import Window

    from pixelspark.ops.llm import cosine

    bm = bm25_scores(docs, terms, text_col=text_col, id_col=id_col)
    bm_top = bm.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(n_each)
    w_bm = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    bm_rank = bm_top.select(
        "doc_id", F.row_number().over(w_bm).alias("bm25_rank")
    )

    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("__q_vec")
    )
    scored = (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("__q_vec")), 6).alias("cos"),
        )
    )
    vec_top = scored.orderBy(F.col("cos").desc(), F.col("doc_id").asc()).limit(n_each)
    w_v = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
    vec_rank = vec_top.select(
        "doc_id", F.row_number().over(w_v).alias("vec_rank")
    )
    fused = bm_rank.join(vec_rank, "doc_id", "full_outer")
    contrib = lambda r: F.coalesce(  # noqa: E731
        1.0 / (F.lit(rrf_k) + F.col(r)), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            "bm25_rank",
            "vec_rank",
            F.round(contrib("bm25_rank") + contrib("vec_rank"), 6).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(k)
    )
