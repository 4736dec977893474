"""Dense quality classifier (ops/classifier.py): the distributed GD
fit must compute the same math as a sequential reference on identical
rows, and the distilled model must actually reproduce its teacher
rule's decisions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pixelspark.ops import classifier as CL
from pixelspark.ops.llm import gopher_quality
from pixelspark.schemas import load_table
import pytest

SF = "/root/testdata/sf0.001"


def _labeled_features(spark):
    docs = load_table(spark, SF, "documents")
    labels = gopher_quality(docs).select(
        "doc_id", F.col("passes").cast("double").alias("label")
    )
    return CL.quality_features(docs).join(labels, "doc_id")


def test_fit_matches_sequential_reference(spark):
    """Same rows, same hyperparameters -> same weights (up to float
    partition-sum reassociation, which is why the registered query is
    rows-only)."""
    feats = _labeled_features(spark)
    w_spark = CL.fit_logreg(feats, CL.QUALITY_FEATURES, "label", iters=10, lr=2.0)
    rows = (
        feats.na.drop(subset=CL.QUALITY_FEATURES)
        .select(*CL.QUALITY_FEATURES, "label")
        .collect()
    )
    X = [[r[c] for c in CL.QUALITY_FEATURES] for r in rows]
    y = [r["label"] for r in rows]
    w_ref = CL.fit_logreg_reference(X, y, iters=10, lr=2.0)
    for a, b in zip(w_spark, w_ref):
        assert abs(a - b) < 1e-6, (w_spark, w_ref)


@pytest.mark.slow  # deep end-to-end matrix: certification tier (r13; pytest.ini)
def test_distilled_model_reproduces_teacher_rule(spark):
    """After the full fit, the linear model must agree with the Gopher
    rule on every complete-feature document (the rule is linearly
    separable in this feature space — measured, then pinned; the
    sf0.001 slice needs 50 GD steps to separate, vs 25 at sf0.01)."""
    feats = _labeled_features(spark)
    w = CL.fit_logreg(feats, CL.QUALITY_FEATURES, "label", iters=50, lr=2.0)
    scored = CL.score_logreg(
        feats.na.drop(subset=CL.QUALITY_FEATURES), CL.QUALITY_FEATURES, w
    )
    n, agree = scored.agg(
        F.count(F.lit(1)),
        F.sum(((F.col("score") >= 0.5) == (F.col("label") >= 0.5)).cast("long")),
    ).first()
    assert n > 0
    assert agree / n >= 0.99, f"distilled model agrees on only {agree}/{n}"


def test_frozen_scorer_matches_hand_sigmoid(spark):
    """One hand-computed row pins the literal dot-product + sigmoid."""
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, 4.0, 0.5, 3.0, 1.0)],
        "doc_id long, f_bias double, f_log_tokens double, f_mean_len double,"
        " f_distinct double, f_stop_kinds double, f_alpha_frac double",
    )
    w = [0.5, 1.0, -0.25, 2.0, 0.1, -1.0]
    z = 0.5 * 1.0 + 1.0 * 2.0 + -0.25 * 4.0 + 2.0 * 0.5 + 0.1 * 3.0 + -1.0 * 1.0
    expect = 1.0 / (1.0 + math.exp(-z))
    got = CL.score_logreg(df, CL.QUALITY_FEATURES, w).first()["score"]
    assert abs(got - expect) < 1e-12


def test_empty_document_scores_null(spark):
    df = spark.createDataFrame([(1, "   "), (2, "real text here ok yes")],
                               "doc_id long, text string")
    scored = CL.score_logreg(
        CL.quality_features(df), CL.QUALITY_FEATURES, [0.0] * 6
    ).orderBy("doc_id").collect()
    assert scored[0]["score"] is None
    assert scored[1]["score"] is not None


def test_fit_excludes_null_feature_rows(spark):
    """An all-empty corpus has nothing to fit on."""
    df = spark.createDataFrame([(1, " "), (2, "")], "doc_id long, text string")
    feats = CL.quality_features(df).withColumn("label", F.lit(1.0))
    try:
        CL.fit_logreg(feats, CL.QUALITY_FEATURES, "label", iters=1)
    except ValueError as e:
        assert "no complete-feature rows" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")
