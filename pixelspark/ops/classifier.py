"""Distributed linear text-quality classifier (fastText-style
heuristic distillation).

The standard pipeline pattern at pretraining scale: a rule-based
quality filter (here the Gopher rule pack, ops/llm.py gopher_quality)
labels a corpus, and a cheap dense model is trained on those labels so
later corpora can be scored with a single projection — no rules, no
Python, one pass.  This module implements both halves Spark-first:

* `quality_features` — the per-document feature projection, pure
  column expressions (shuffle-free, whole-stage-codegen).  Continuous
  features are rounded at 6dp so the exact same feature values are
  computable in DuckDB/BigQuery/Trino for cross-engine verification.
* `fit_logreg` — full-batch gradient-descent logistic regression as
  ONE partial-aggregated Spark job per iteration: the weight vector
  (d doubles) lives on the driver and enters the plan as literals,
  the gradient is d map-side-combined SUMs, nothing else crosses the
  wire.  This is exactly the aggregation shape Spark MLlib's own
  LogisticRegression uses (treeAggregate of per-partition gradient
  sums); at 100 TB each iteration is one scan of the cached feature
  relation and the driver state stays d floats.
* `score_logreg` — scoring with frozen weights is a dot product +
  sigmoid built from literals: JVM-side, broadcast-free, and
  SQL-expressible, so the scoring query carries a value-level oracle.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pixelspark.ops.llm import STOPWORDS, tokens

#: Frozen production scorer weights, distilled offline against the
#: Gopher rule pack (25 GD iterations, lr 2.0, 100% train agreement at
#: sf0.01), rounded to 3dp and pinned.  Positional over
#: QUALITY_FEATURES.
QUALITY_WEIGHTS = [-0.856, 2.337, -4.762, -2.018, 10.31, -0.856]

#: Feature order is part of the model contract (weights are positional).
QUALITY_FEATURES = [
    "f_bias",
    "f_log_tokens",
    "f_mean_len",
    "f_distinct",
    "f_stop_kinds",
    "f_alpha_frac",
]


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document classifier features — one shuffle-free projection.

    f_bias       1.0
    f_log_tokens ln(1 + token count)        (size signal)
    f_mean_len   mean token length, 6dp     (gibberish / CJK signal)
    f_distinct   distinct-token ratio, 6dp  (repetition signal)
    f_stop_kinds distinct EN-stopword hits  (natural-language signal)
    f_alpha_frac frac of alphabetic tokens, 6dp

    Empty documents (no tokens) produce NULL ratio features and score
    NULL downstream — deliberate: an empty doc has no quality, and the
    NULL propagates identically in the SQL oracle.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    safe_n = F.nullif(n.cast("double"), F.lit(0.0))
    mean_len = F.round(
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t).cast("double"))
        / safe_n,
        6,
    )
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_kinds = F.size(F.array_intersect(F.transform(toks, F.lower), sw))
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double") / safe_n,
        6,
    )
    return docs.select(
        F.col(id_col),
        F.lit(1.0).alias("f_bias"),
        F.log(F.lit(1.0) + n.cast("double")).alias("f_log_tokens"),
        mean_len.alias("f_mean_len"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / safe_n, 6).alias(
            "f_distinct"
        ),
        stop_kinds.cast("double").alias("f_stop_kinds"),
        alpha_frac.alias("f_alpha_frac"),
    )


def linear_z(feature_cols: Sequence[str], weights: Sequence[float]) -> Column:
    """w · x as a left-associated literal sum (the association order is
    part of the cross-engine contract — the oracle mirrors it)."""
    if len(feature_cols) != len(weights):
        raise ValueError("feature/weight arity mismatch")
    z = F.lit(float(weights[0])) * F.col(feature_cols[0])
    for c, w in zip(feature_cols[1:], weights[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def score_logreg(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: Sequence[float],
    score_col: str = "score",
) -> DataFrame:
    """sigmoid(w · x) with frozen weights — literals only, JVM-side."""
    z = linear_z(feature_cols, weights)
    return df.withColumn(score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def fit_logreg(
    feat_df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 25,
    lr: float = 2.0,
) -> list[float]:
    """Full-batch GD logistic regression, one aggregation job per
    iteration.

    Rows with any NULL feature are excluded from the fit (they cannot
    be scored either).  The feature relation is cached once; each
    iteration plans sigmoid(w·x) with the current weights as literals
    and aggregates the d gradient components map-side-combined — the
    shuffle carries d doubles per partition.  Driver state: w (d
    floats) and n (one long).  No collect of data rows ever happens,
    so the same code is the 100-TB plan.
    """
    d = len(feature_cols)
    clean = feat_df.na.drop(subset=list(feature_cols)).select(
        *feature_cols, F.col(label_col).cast("double").alias("__y")
    )
    clean = clean.persist()
    try:
        n = clean.count()
        if n == 0:
            raise ValueError("no complete-feature rows to fit on")
        w = [0.0] * d
        for _ in range(iters):
            z = linear_z(feature_cols, w)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("__y")
            row = clean.agg(
                *[F.sum(err * F.col(c)).alias(f"g{i}") for i, c in enumerate(feature_cols)]
            ).first()
            w = [w[i] - lr * row[f"g{i}"] / n for i in range(d)]
        return w
    finally:
        clean.unpersist()


def fit_logreg_reference(
    X: list[list[float]], y: list[float], iters: int = 25, lr: float = 2.0
) -> list[float]:
    """Driver-side reference implementation (same math, sequential) —
    the pytest gate trains both on identical rows and compares."""
    d = len(X[0])
    n = len(X)
    w = [0.0] * d
    for _ in range(iters):
        g = [0.0] * d
        for xi, yi in zip(X, y):
            z = sum(wj * xj for wj, xj in zip(w, xi))
            p = 1.0 / (1.0 + math.exp(-z))
            for j in range(d):
                g[j] += (p - yi) * xi[j]
        w = [w[j] - lr * g[j] / n for j in range(d)]
    return w
