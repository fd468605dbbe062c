"""Sequence packing invariants."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.packing import _SEQ_STRIDE, pack_sequences


@pytest.fixture(scope="module")
def toks(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_every_doc_packed_once(toks):
    out = pack_sequences(toks, budget=128, n_buckets=4)
    assert out.count() == 200
    assert out.select("doc_id").distinct().count() == 200


def test_offsets_within_budget_and_consistent(toks):
    out = pack_sequences(toks, budget=128, n_buckets=4).collect()
    for r in out:
        assert 0 <= r["seq_offset"] < 128
        assert r["seq_id"] // _SEQ_STRIDE == r["pack_bucket"]
    # a sequence's docs have distinct offsets (docs don't overlap)
    seen = {}
    for r in out:
        key = (r["seq_id"], r["seq_offset"])
        assert key not in seen, key
        seen[key] = r["doc_id"]


def test_sequences_fill_toward_budget(toks):
    """Best-effort packing: every non-final sequence of a bucket starts
    where the previous left off — total tokens per bucket equals the
    bucket's doc token sum regardless of chunking."""
    out = pack_sequences(toks, budget=128, n_buckets=4)
    per_bucket = out.groupBy("pack_bucket").agg(
        F.sum("n_tokens").alias("toks"),
        F.countDistinct("seq_id").alias("n_seqs"),
    )
    for r in per_bucket.collect():
        # each sequence starts a fresh 128-token window: n_seqs is the
        # ceiling of the bucket's token count over the budget (+/- the
        # straddle slack of the final doc per window)
        assert r["n_seqs"] >= r["toks"] // (128 * 2)
        assert r["n_seqs"] <= r["toks"] // 128 + 1


def test_deterministic_under_reordering(toks):
    a = pack_sequences(toks, budget=128, n_buckets=4)
    b = pack_sequences(
        toks.orderBy(F.rand(seed=7)).repartition(13), budget=128, n_buckets=4
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salt_decorrelates(toks):
    a = pack_sequences(toks, budget=128, n_buckets=4)
    b = pack_sequences(toks, budget=128, n_buckets=4, salt="v2")
    joined = a.select("doc_id", "seq_id").join(
        b.select("doc_id", F.col("seq_id").alias("seq_id_b")), "doc_id"
    )
    assert joined.where(F.col("seq_id") != F.col("seq_id_b")).count() > 0


def test_budget_validation(toks):
    with pytest.raises(ValueError):
        pack_sequences(toks, budget=0)
