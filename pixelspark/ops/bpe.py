"""Distributed BPE (byte-pair-encoding) vocabulary induction and
encoding — the tokenizer-training step of an LLM data pipeline
(Sennrich et al. 2016, arXiv:1508.07909), Spark-first.

Why this scales where naive BPE does not: training never iterates
over the CORPUS.  One distributed pass builds the word-frequency
table (distinct words + counts — vocabulary-sized, millions of rows
at web scale, not billions), and every merge iteration is then

  1. one JVM-side pair count over that table (slice + zip_with +
     explode + groupBy — no Python in the pair-count hot path), and
  2. the winning pair applied to the symbol arrays by an Arrow-batched
     kernel (vectorized per word, no per-row Python round trips),

so per-merge cost is O(|vocab|), and the corpus is touched exactly
once more at encode time.  Symbol arrays are localCheckpoint'ed every
few merges — each merge stacks a UDF onto the lineage, and without
truncation iteration i would re-execute merges 1..i-1 (the same
lineage discipline as ops/graph.pagerank).

Ties (equal pair counts) break lexicographically, so the learned
merge list is DETERMINISTIC — pytest pins it against a pure-Python
reference implementation (tests/test_bpe.py)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from pixelspark.ops.llm import tokens

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercased whitespace words + frequencies — the ONLY
    corpus-wide pass in BPE training."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(wc: DataFrame) -> DataFrame:
    """word -> [c, h, a, r, s, </w>] (the end-of-word sentinel makes
    suffix merges distinct from mid-word merges, per the paper)."""
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != "")
    return wc.select(
        "w", "cnt", F.concat(chars, F.array(F.lit(END))).alias("syms")
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies, weighted by word count — pure column
    ops: zip each symbol array against itself shifted by one."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.slice("syms", 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        syms.where(n >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p")
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge(pair: tuple[str, str]):
    """Arrow-batched kernel merging non-overlapping (a, b) -> a+b
    left-to-right in each symbol array (the classic BPE scan)."""
    a, b = pair
    ab = a + b

    @F.pandas_udf(ArrayType(StringType()))
    def merge(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(s):
            out, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        for series in it:
            yield series.map(one)

    return merge


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges; returns them in application order.
    Stops early when no pair reaches `min_count`.  Deterministic:
    argmax ties break on (count desc, pair lexicographic asc)."""
    syms = _initial_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        pair = (top[0]["p"]["a"], top[0]["p"]["b"])
        merges.append(pair)
        syms = syms.select("w", "cnt", _apply_merge(pair)("syms").alias("syms"))
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()  # truncate the stacked-UDF lineage
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Driver/executor-side classic BPE encode of one word: repeatedly
    merge the lowest-rank adjacent pair."""
    s = [c for c in word] + [END]
    while len(s) >= 2:
        best, best_rank = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        s = s[:best] + [s[best] + s[best + 1]] + s[best + 2:]
    return s


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each document with the learned merges: (id, tokens,
    n_tokens).  Each DISTINCT word is encoded once (the vocabulary
    table again, not the corpus) and joined back onto the exploded
    word stream — at 100 TB the Python kernel runs over millions of
    distinct words, not trillions of word occurrences."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            yield series.map(lambda w: encode_word(w, ranks))

    occurrences = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "w")
    ).select(id_col, "pos", F.lower("w").alias("w"))
    vocab = occurrences.select("w").distinct().select(
        "w", enc("w").alias("word_toks")
    )
    return (
        occurrences.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word_toks"))
                    ),
                    lambda s: s["word_toks"],
                )
            ).alias("tokens")
        )
        .select(id_col, "tokens", F.size("tokens").alias("n_tokens"))
    )
