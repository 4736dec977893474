"""Sampling ops: determinism under repartitioning, proportions,
disjoint exhaustive splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixelspark.ops import sampling as SP
from pixelspark.schemas import load_table


def test_stratified_sample_deterministic_and_proportional(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 0.2}
    a = SP.stratified_sample(docs, "lang", fractions, "doc_id", seed=7)
    b = SP.stratified_sample(docs.repartition(13), "lang", fractions, "doc_id", seed=7)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # identical rows regardless of partitioning
    # only listed strata survive
    assert {r["lang"] for r in a.select("lang").distinct().collect()} <= {"en", "de"}
    n_en = docs.where(F.col("lang") == "en").count()
    got_en = a.where(F.col("lang") == "en").count()
    assert abs(got_en / n_en - 0.5) < 0.2  # small-sample tolerance


def test_split_disjoint_exhaustive_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = SP.train_val_test_split(docs, "doc_id", seed=3)
    s2 = SP.train_val_test_split(docs.repartition(7), "doc_id", seed=3)
    m1 = {r["doc_id"]: r["split"] for r in s1.select("doc_id", "split").collect()}
    m2 = {r["doc_id"]: r["split"] for r in s2.select("doc_id", "split").collect()}
    assert m1 == m2  # stable across partitioning
    assert len(m1) == docs.count()  # exhaustive
    counts = s1.groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in counts}
    assert set(by) == {"train", "val", "test"}
    assert by["train"] > by["val"] and by["train"] > by["test"]


def test_corpus_mixture_provenance(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    en = docs.where(F.col("lang") == "en")
    de = docs.where(F.col("lang") == "de")
    mix = SP.corpus_mixture(
        {"en": en, "de": de}, {"en": 1.0, "de": 0.5}, "doc_id", seed=1
    )
    srcs = {r["mixture_source"] for r in mix.select("mixture_source").distinct().collect()}
    assert srcs == {"en", "de"}
    assert mix.where(F.col("mixture_source") == "en").count() == en.count()  # w=1 keeps all


def test_group_topk_sample_exact_k(spark, sf_dir):
    from pixelspark.ops.sampling import group_topk_sample
    from pixelspark.schemas import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    got = group_topk_sample(d, "lang", "doc_id", k=5)
    sizes = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(5, avail[lang])
    # deterministic across invocations
    a = {r["doc_id"] for r in got.collect()}
    b = {r["doc_id"] for r in group_topk_sample(d, "lang", "doc_id", k=5).collect()}
    assert a == b
    # different seed -> (almost surely) different sample
    c = {r["doc_id"] for r in group_topk_sample(d, "lang", "doc_id", k=5, seed=7).collect()}
    assert a != c


def test_domain_mixture_rates_properties(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    target = {"en": 0.3, "de": 0.175, "es": 0.175, "fr": 0.175, "zh": 0.175}
    rates = {r["domain"]: r for r in SP.domain_mixture_rates(docs, "lang", target).collect()}
    assert set(rates) == set(target)
    # every rate in (0, 1]; the scarcest-vs-target domain is kept whole
    assert all(0.0 < r["keep_rate"] <= 1.0 for r in rates.values())
    assert any(abs(r["keep_rate"] - 1.0) < 1e-12 for r in rates.values())
    # expected post-sample shares == target shares (rate * obs ∝ t)
    exp_mass = {d: rates[d]["keep_rate"] * rates[d]["obs_share"] for d in rates}
    tot = sum(exp_mass.values())
    for d, t in target.items():
        assert abs(exp_mass[d] / tot - t) < 1e-9, (d, exp_mass[d] / tot, t)


def test_domain_mixture_sample_deterministic_and_directional(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    target = {"en": 0.3, "de": 0.175, "es": 0.175, "fr": 0.175, "zh": 0.175}
    sel = SP.domain_mixture_sample(docs, "lang", target, "doc_id", seed=11)
    a = {r["doc_id"] for r in sel.select("doc_id").collect()}
    b = {r["doc_id"] for r in SP.domain_mixture_sample(
        docs, "lang", target, "doc_id", seed=11).select("doc_id").collect()}
    assert a == b  # hash-deterministic
    # en is over-represented vs 0.3 target -> it must be downsampled;
    # realized share moves toward the target
    n0 = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n1 = {r["lang"]: r["n"] for r in sel.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    share0 = n0["en"] / sum(n0[d] for d in target)
    share1 = n1["en"] / sum(n1.values())
    assert share0 > 0.3
    assert abs(share1 - 0.3) < abs(share0 - 0.3)
    # schema untouched (helper columns dropped)
    assert sel.columns == docs.columns
