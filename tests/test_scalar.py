"""Scalar pack F1-F13 unit tests (reference semantics cited per case)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixelspark.ops import scalar as S


def _one(spark, col, **data):
    df = spark.createDataFrame([tuple(data.values())], list(data.keys()))
    return df.select(col.alias("out")).collect()[0]["out"]


def test_strip_suffix_anchored(spark):
    # bigquery.ts:44 — only the trailing suffix is stripped
    assert _one(spark, S.strip_suffix("s"), s="shop1.myshopify.com") == "shop1"
    assert _one(spark, S.strip_suffix("s"), s="a.myshopify.com.b") == "a.myshopify.com.b"
    assert _one(spark, S.strip_suffix("s"), s="plain") == "plain"


def test_ensure_suffix(spark):
    # shopifyBilling.ts:240-242
    assert _one(spark, S.ensure_suffix("s"), s="shop1") == "shop1.myshopify.com"
    assert _one(spark, S.ensure_suffix("s"), s="shop1.myshopify.com") == "shop1.myshopify.com"


def test_money_2dp(spark):
    # shopifyBilling.ts:209 — toFixed(2)
    assert _one(spark, S.money_2dp(F.lit(3.14159)), x=0) == "3.14"
    assert _one(spark, S.money_2dp(F.lit(10.0)), x=0) == "10.00"


def test_iso_date_and_event_day(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 2, 23, 59, 59)
    assert _one(spark, S.iso_date("t"), t=ts) == "2024-01-02"
    assert str(_one(spark, S.event_day("t"), t=ts)) == "2024-01-02"


def test_json_get(spark):
    assert _one(spark, S.json_get("j", "$.k"), j='{"k": 87}') == "87"
    assert _one(spark, S.json_get("j", "$.missing"), j='{"k": 87}') is None


def test_coalesce0_and_grouped(spark):
    assert _one(spark, S.coalesce0(F.lit(None).cast("long")), x=0) == 0
    assert _one(spark, S.grouped_number(F.lit(1234567)), x=0) == "1,234,567"


def test_truncate_str(spark):
    assert _one(spark, S.truncate_str("s", 4), s="abcdefgh") == "abcd"


def test_udtf_tokens_equals_posexplode(spark, sf_dir):
    """The Python UDTF path and the JVM-side posexplode(split()) path
    must produce identical (doc_id, word, pos) rows — the UDTF is API
    coverage; posexplode is the hot path."""
    from pixelspark.ops.udtf import register_udtfs
    from pixelspark.schemas import load_table

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("__docs_udtf_eq")
    via_udtf = spark.sql(
        "SELECT d.doc_id, t.word, t.pos FROM __docs_udtf_eq d, LATERAL tokenize_words(d.text) t"
    )
    via_explode = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("p0", "word"),
    ).select("doc_id", "word", (F.col("p0") + 1).cast("int").alias("pos"))
    assert via_udtf.count() > 0
    assert via_udtf.exceptAll(via_explode).count() == 0
    assert via_explode.exceptAll(via_udtf).count() == 0
