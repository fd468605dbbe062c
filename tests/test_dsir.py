"""DSIR importance resampling (operators/dsir.py): hashed-n-gram
log-likelihood-ratio weights + Gumbel-top-k selection. The oracle
parity sweep checks the full pipeline value-for-value against DuckDB;
here the gates are the semantics a mirror can't state: a numpy
reference computation, target separation, resampling behavior, and
the determinism/independence laws."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.dsir import dsir_sample, dsir_weights

DOCS = [
    # target rows (is_t=1) share the "good data" vocabulary
    (1, "good data good model", 1),
    (2, "good model", 1),
    # raw-only rows use a disjoint vocabulary
    (3, "mal datos mal modelo", 0),
    (4, "mal modelo", 0),
    # mixed
    (5, "good datos", 0),
    (6, "", 0),
    (7, None, 0),
]


def _bucket(feat: str, buckets: int = 1024, salt: str = "dsir") -> int:
    return int(hashlib.md5((salt + feat).encode()).hexdigest()[:15], 16) % buckets


def _reference_weights(buckets: int = 1024):
    """Plain-Python DSIR: the spec the Spark plan must reproduce."""
    feats_by_doc = {}
    for did, text, _ in DOCS:
        toks = text.split() if text else []
        feats_by_doc[did] = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
    tc, rc = {}, {}
    for did, _, is_t in DOCS:
        for f in feats_by_doc[did]:
            b = _bucket(f, buckets)
            rc[b] = rc.get(b, 0) + 1
            if is_t:
                tc[b] = tc.get(b, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    out = {}
    for did, _, _ in DOCS:
        w = 0.0
        for f in feats_by_doc[did]:
            b = _bucket(f, buckets)
            w += math.log((tc.get(b, 0) + 1.0) / (T + buckets)) - math.log(
                (rc[b] + 1.0) / (R + buckets)
            )
        out[did] = w
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, is_t int")


def test_weights_match_reference_spec(docs):
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(docs, "doc_id", "text", F.col("is_t") == 1).collect()
    }
    want = _reference_weights()
    assert got.keys() == want.keys()
    for did in want:
        assert got[did] == pytest.approx(want[did], abs=1e-9), did


def test_weights_separate_target_vocabulary(docs):
    w = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(docs, "doc_id", "text", F.col("is_t") == 1).collect()
    }
    # every target-vocab doc outweighs every raw-only-vocab doc
    assert min(w[1], w[2]) > max(w[3], w[4])
    # featureless docs carry no evidence
    assert w[6] == 0.0 and w[7] == 0.0


def test_sample_is_deterministic_and_resalting_independent(docs):
    t = F.col("is_t") == 1
    a = {r["doc_id"] for r in dsir_sample(docs, "doc_id", "text", t, 3).collect()}
    b = {r["doc_id"] for r in dsir_sample(docs, "doc_id", "text", t, 3).collect()}
    assert a == b and len(a) == 3
    c = {
        r["doc_id"]
        for r in dsir_sample(
            docs, "doc_id", "text", t, 3, gumbel_salt="other"
        ).collect()
    }
    assert len(c) == 3  # an independent draw (may or may not differ)


def test_sample_prefers_target_like_docs(docs):
    # raw-vocabulary docs sit 3-7 nats below everything else (target
    # docs AND the zero-evidence featureless docs) — with 3 slots they
    # must lose; Gumbel noise (±~2 nats) can't bridge that gap here
    got = {
        r["doc_id"]
        for r in dsir_sample(docs, "doc_id", "text", F.col("is_t") == 1, 3).collect()
    }
    assert got.isdisjoint({3, 4}), got


def test_validation(docs):
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(docs, "doc_id", "text", F.lit(True), buckets=0)
    with pytest.raises(ValueError, match="sample size"):
        dsir_sample(docs, "doc_id", "text", F.lit(True), 0)
