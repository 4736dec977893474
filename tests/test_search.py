"""Corpus-search ops: inverted index postings and BM25 scoring
verified against hand-computed values on a tiny fixed corpus."""

from __future__ import annotations

import math

from pixelspark.ops.search import bm25_scores, inverted_index


def _corpus(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the dog sat sat"),
        (3, "a cat and a cat"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index_postings(spark):
    idx = {
        r["token"]: (r["doc_count"], r["postings"])
        for r in inverted_index(_corpus(spark)).collect()
    }
    assert idx["cat"] == (2, "1,3")
    assert idx["sat"] == (2, "1,2")
    assert idx["the"] == (2, "1,2")
    assert idx["a"] == (1, "3")
    # empty doc contributes no tokens at all
    assert all("4" not in p.split(",") for _, p in idx.values())


def test_inverted_index_df_bounds(spark):
    idx = inverted_index(_corpus(spark), min_df=2)
    assert {r["token"] for r in idx.collect()} == {"cat", "sat", "the", "dog"} - {"dog"}
    capped = inverted_index(_corpus(spark), max_df=1)
    assert all(r["doc_count"] == 1 for r in capped.collect())


def test_bm25_hand_computed(spark):
    # corpus: dl = [3, 4, 5]; N = 3 docs with tokens; avgdl = 4
    # query {cat}: df = 2, idf = ln((3 - 2 + 0.5)/(2 + 0.5) + 1) = ln(1.6)
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(_corpus(spark), ["cat"], round_dp=6).collect()
    }
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 4.0))

    assert set(got) == {1, 3}
    assert got[1] == round(s(1, 3), 6)
    assert got[3] == round(s(2, 5), 6)


def test_bm25_multi_term_is_sum(spark):
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(_corpus(spark), ["cat", "dog"], round_dp=6).collect()
    }
    single_cat = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(_corpus(spark), ["cat"], round_dp=6).collect()
    }
    # doc 1 and 3 contain only 'cat' of the query -> identical contribution
    assert got[1] == single_cat[1]
    assert got[3] == single_cat[3]
    assert 2 in got  # dog-only doc now scored


def _emb(spark):
    # vec 0 is the query; 1 is nearly parallel to it, 2 orthogonal,
    # 3 anti-parallel
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hybrid_rrf_fuses_both_lists(spark):
    from pixelspark.ops.search import hybrid_rrf

    docs = _corpus(spark)
    out = hybrid_rrf(docs, _emb(spark), ["cat"], query_vec_id=0,
                     n_each=10, k=10).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 3 ('a cat and a cat', tf=2) outranks doc 1 lexically
    assert by_id[3]["bm25_rank"] == 1 and by_id[1]["bm25_rank"] == 2
    # vector list ranks by cosine: 1 (parallel) > 2 (orthogonal) > 3
    assert by_id[1]["vec_rank"] == 1
    # doc 1 is in BOTH lists: rrf = 1/(60+2) + 1/(60+1)
    assert by_id[1]["rrf"] == round(1 / 62 + 1 / 61, 6)
    # doc 2 is vector-only (no 'cat'): bm25_rank NULL, single contribution
    assert by_id[2]["bm25_rank"] is None
    assert by_id[2]["rrf"] == round(1 / 62, 6)
    # fusion order: doc 1 (two contributions) first
    assert out[0]["doc_id"] == 1


def test_bm25_single_corpus_pass_plan(spark):
    """r13: bm25 computes dl AND every per-term tf in ONE groupBy
    (doc_id) aggregation over the token stream, materialized once —
    the scoring plan must read the checkpointed per-doc relation
    (Scan ExistingRDD), never a second corpus scan, and needs no
    dl-side join (dl rides the unpivoted rows)."""
    docs = _corpus(spark)
    out = bm25_scores(docs, ["cat", "dog"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every consumer reads the one materialized per-doc aggregate
    assert "Scan ExistingRDD" in plan, plan[:2000]
    assert plan.count("FileScan parquet") == 0, plan[:2000]
    # the r12 shape re-attached dl with a second shuffle join; the
    # only join left is the broadcast of the tiny per-term df
    assert plan.count("SortMergeJoin") == 0, plan[:2000]
