"""Distributed Bloom filter (operators/bloom.py): no false negatives,
bounded false positives, broadcast-probe plan, and the exact ingest
pre-gate composition."""

import re

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_new_docs,
)


def test_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id")).alias("v")
    )
    others = spark.range(0, 2000).select(
        F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    words = bloom_build(members, "v", num_bits=1 << 16, num_hashes=5)
    # every member must probe True (Bloom's hard guarantee)
    got = bloom_might_contain(
        members, words, "v", num_bits=1 << 16, num_hashes=5
    )
    assert got.where(~F.col("might_contain")).count() == 0
    # non-members mostly probe False; FP rate stays near theory
    # ((1-e^{-kn/m})^k ~ 0.2% for n=2000, m=65536, k=5; assert << 5%)
    fp = (
        bloom_might_contain(
            others, words, "v", num_bits=1 << 16, num_hashes=5
        )
        .where(F.col("might_contain"))
        .count()
    )
    assert fp < 100, f"false-positive rate too high: {fp}/2000"


def test_words_table_is_bounded(spark):
    members = spark.range(0, 10_000).select(F.col("id").cast("string").alias("v"))
    words = bloom_build(members, "v", num_bits=1 << 12, num_hashes=3)
    assert words.count() <= (1 << 12) // 64


def test_null_values(spark):
    df = spark.createDataFrame([("a",), (None,)], "v STRING")
    words = bloom_build(df, "v", num_bits=1 << 10, num_hashes=3)
    out = bloom_might_contain(df, words, "v", num_bits=1 << 10, num_hashes=3)
    got = {r["v"]: r["might_contain"] for r in out.collect()}
    assert got["a"] is True
    assert got[None] is False  # NULL is never "present"


def test_probe_plan_broadcasts_words(spark):
    from mysql_syncer_spark.sources.bucketed import physical_plan

    members = spark.range(0, 100).select(F.col("id").cast("string").alias("v"))
    words = bloom_build(members, "v")
    out = bloom_might_contain(members, words, "v")
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bloom_gate_equals_plain_anti_join(spark, sf_dir):
    """The pre-gated composition must be EXACT: same rows as the plain
    fingerprint anti-join, with the exact join fed only the maybe
    sliver."""
    from mysql_syncer_spark.operators.text import normalized_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    incoming = docs.where(F.col("doc_id") % 10 == 0)
    got = {
        r["doc_id"] for r in bloom_new_docs(corpus, incoming).collect()
    }
    fp = F.md5(normalized_text("text"))
    want = {
        r["doc_id"]
        for r in incoming.withColumn("__fp", fp)
        .join(
            corpus.select(fp.alias("__fp")).distinct(),
            on="__fp",
            how="left_anti",
        )
        .collect()
    }
    assert got == want
    assert got  # non-trivial on the fixture


def test_validation(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "v", num_bits=100)
