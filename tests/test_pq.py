"""Product-quantization tests: codebook shapes and determinism,
encode/decode reconstruction sanity, the ADC recall floor against the
exact brute-force baseline, and index reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixelspark.ops.llm import cosine_topk
from pixelspark.ops.pq import ann_pq_topk, pq_encode, pq_train
from pixelspark.schemas import load_table

QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=8, ksub=16, n_iter=2)


def test_codebook_shape_and_determinism(emb, books):
    assert len(books) == 8
    assert all(len(cb) == 16 for cb in books)
    assert all(len(c) == 8 for cb in books for c in cb)
    again = pq_train(emb.repartition(5), m=8, ksub=16, n_iter=2)
    for j in range(8):
        for c in range(16):
            assert books[j][c] == pytest.approx(again[j][c], abs=1e-9)


def test_encode_codes_in_range_and_deterministic(emb, books):
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb.repartition(3), books).collect()}
    for r in codes:
        assert again[r["vec_id"]] == r["codes"]


def test_encode_picks_nearest_centroid(spark, books):
    # a vector that IS a concatenation of centroids must encode to
    # exactly those centroid ids (distance zero beats everything)
    vec = [x for j in range(8) for x in books[j][3]]
    df = spark.createDataFrame([(99, vec)], "vec_id long, embedding array<double>")
    got = pq_encode(df, books).collect()[0]["codes"]
    assert got == [3] * 8


def test_pq_recall_floor_vs_exact(spark, emb):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, QUERY_IDS, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_pq_topk(
            emb, QUERY_IDS, k=5, m=8, ksub=16, n_iter=2, shortlist=100
        ).collect()
    }
    # shortlist = 20% of this 500-vector corpus; at scale the ratio is
    # far smaller (10k of billions) — the gate pins the ADC ordering
    # quality, not the ratio
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))


def test_index_reuse_matches_fresh_train(emb, books):
    codes = pq_encode(emb, books)
    reused = ann_pq_topk(
        emb, QUERY_IDS, k=5, shortlist=100, codebooks=books, codes=codes
    ).collect()
    fresh = ann_pq_topk(
        emb, QUERY_IDS, k=5, m=8, ksub=16, n_iter=2, shortlist=100
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["neighbor_id"], r["rank"]) for r in reused]
    ) == sorted([(r["query_id"], r["neighbor_id"], r["rank"]) for r in fresh])


def test_ivfpq_recall_floor_and_probe_monotonicity(spark, emb):
    from pixelspark.ops.pq import ann_ivfpq_topk, ivfpq_index

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, QUERY_IDS, k=5).collect()
    }
    idx = ivfpq_index(emb, n_clusters=8, m=8, ksub=16, n_iter=2)
    got = {}
    for n_probe in (1, 3):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_ivfpq_topk(
                emb, QUERY_IDS, k=5, n_probe=n_probe, shortlist=100, index=idx
            ).collect()
        }
        got[n_probe] = len(approx & exact) / len(exact)
    assert got[3] >= 0.9, got
    # probing more lists can only widen the candidate set
    assert got[3] >= got[1], got


def test_ivfpq_residual_codes_cover_clusters(emb):
    from pixelspark.ops.pq import ivfpq_index

    centroids, codebooks, codes = ivfpq_index(emb, n_clusters=8, m=8, ksub=16, n_iter=2)
    assert len(centroids) == 8 and len(codebooks) == 8
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert {r["cluster"] for r in rows} <= set(range(8))
    for r in rows:
        assert len(r["codes"]) == 8 and all(0 <= c < 16 for c in r["codes"])


def test_registry_queries_run(spark, sf_dir):
    from pixelspark.queries import QUERIES

    for qname in ("q_ann_pq", "q_ann_ivfpq"):
        out = QUERIES[qname](spark, sf_dir)
        assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
        rows = out.collect()
        per_q: dict[int, list[int]] = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(per_q) == set(QUERY_IDS), qname
        for ranks in per_q.values():
            assert sorted(ranks) == [1, 2, 3, 4, 5]
