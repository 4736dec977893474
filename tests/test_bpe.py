"""Distributed BPE training/encoding vs a pure-Python reference
implementation of Sennrich et al. 2016 — merge lists and encodings
must match EXACTLY (deterministic tie-breaks on both sides)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pixelspark.ops import bpe as B
from pixelspark.schemas import load_table

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest"),
]


def ref_train(texts: list[str], n_merges: int, min_count: int = 2):
    """Reference BPE trainer: dict-of-words, Counter pair counts,
    ties broken (count desc, pair lexicographic asc)."""
    words = Counter()
    for t in texts:
        for w in t.split():
            words[w.lower()] += 1
    vocab = {tuple(list(w) + [B.END]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bpe_train_matches_reference(spark, corpus_df):
    got = B.bpe_train(corpus_df, n_merges=12)
    want = ref_train([t for _, t in CORPUS], 12)
    assert got == want
    # sanity: the classic corpus learns frequent subwords
    assert ("e", "s") in got or ("es", "t" + B.END) in got or ("s", "t" + B.END) in got


def test_bpe_train_min_count_stops_early(spark, corpus_df):
    long_run = B.bpe_train(corpus_df, n_merges=500)
    assert len(long_run) < 500  # exhausted pairs above min_count
    assert long_run == ref_train([t for _, t in CORPUS], 500)


def test_bpe_encode_matches_reference_and_roundtrips(spark, corpus_df):
    merges = B.bpe_train(corpus_df, n_merges=10)
    enc = {r["doc_id"]: list(r["tokens"])
           for r in B.bpe_encode(corpus_df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, text in CORPUS:
        want = []
        for w in text.lower().split():
            want += B.encode_word(w, ranks)
        assert enc[doc_id] == want, doc_id
        # lossless: concatenation reconstructs the normalized text
        joined = "".join(enc[doc_id]).replace(B.END, " ").strip()
        assert joined == " ".join(text.lower().split())


def test_bpe_on_real_documents(spark, sf_dir):
    """End-to-end on the documents table: merges learn, encoding
    covers every doc, token counts are positive and bounded by
    character counts."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    merges = B.bpe_train(docs, n_merges=8)
    assert len(merges) == 8
    enc = B.bpe_encode(docs, merges)
    row = enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_tokens").alias("mn"),
    ).collect()[0]
    n_docs = docs.where(F.length(F.trim("text")) > 0).count()
    assert row["n"] == n_docs and row["mn"] > 0
