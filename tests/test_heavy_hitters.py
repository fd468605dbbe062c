"""Misra-Gries heavy hitters (sketches.mg_*): the mergeable
top-frequency summary. Two regimes, two gates:

* exactness law (capacity >= distinct keys): no fold or merge ever
  compresses, err_bound == 0, and the result IS the exact GROUP-BY
  count — this is the mode the oracle-backed registry query runs in;
* approximate mode (capacity < distinct): results depend on partition
  layout like any MG, so the gates are the paper invariants — for
  every emitted key  est <= true <= est + err_bound,  the total error
  is <= N/(capacity+1), and every key with true count > N/(capacity+1)
  survives compression.
"""

import random

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.sketches import (
    heavy_hitters,
    mg_merge,
    mg_summaries,
)


@pytest.fixture(scope="module")
def skewed(spark):
    data = (
        [("h1",)] * 500
        + [("h2",)] * 300
        + [(f"t{i}",) for i in range(100) for _ in range(5)]
    )
    random.Random(7).shuffle(data)
    return spark.createDataFrame(data, "key string").repartition(4)


TRUE = {"h1": 500, "h2": 300, **{f"t{i}": 5 for i in range(100)}}
N = 1300


def test_exactness_law_matches_groupby(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = {
        r["user_id"]: (r["est"], r["err_bound"], r["n_total"])
        for r in heavy_hitters(
            ev, "user_id", capacity=65536, min_count=75
        ).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 75)
        .collect()
    }
    total = ev.count()
    assert out.keys() == exact.keys()
    for k, (est, err, n_total) in out.items():
        assert est == exact[k]
        assert err == 0
        assert n_total == total


def test_approx_mode_invariants(skewed):
    out = heavy_hitters(skewed, "key", capacity=8).collect()
    assert out, "compression must not empty a skewed stream"
    for r in out:
        t = TRUE[r["key"]]
        assert r["est"] <= t <= r["est"] + r["err_bound"], r
        assert r["err_bound"] <= N / 9, r
        assert r["n_total"] == N
    # the MG survival guarantee: true > N/(capacity+1) => present
    keys = {r["key"] for r in out}
    assert {"h1", "h2"} <= keys


def test_summaries_are_capacity_bounded(skewed):
    s = mg_summaries(skewed, "key", capacity=8)
    n_parts = skewed.rdd.getNumPartitions()
    rows = s.collect()
    # per partition: <= capacity key rows + exactly one NULL sentinel
    assert len(rows) <= n_parts * 9
    sentinels = [r for r in rows if r["key"] is None]
    assert len(sentinels) == n_parts
    assert all(r["dec"] >= 0 for r in sentinels)
    assert all(r["dec"] == 0 for r in rows if r["key"] is not None)


def test_merge_compresses_to_capacity(skewed):
    merged = mg_merge(mg_summaries(skewed, "key", capacity=8), 8).collect()
    assert len(merged) <= 8
    assert len({r["err_bound"] for r in merged}) == 1


def test_null_keys_excluded_and_share_threshold(spark):
    df = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10 + [(None,)] * 50,
        "key string",
    )
    out = {
        r["key"]: r
        for r in heavy_hitters(
            df, "key", capacity=100, min_share=0.25
        ).collect()
    }
    # N excludes NULLs (100); share > 25% keeps a (60%) and b (30%)
    assert set(out) == {"a", "b"}
    assert out["a"]["n_total"] == 100


def test_validation():
    import pyspark.sql

    df = None  # never touched: validation precedes any plan work
    with pytest.raises(ValueError, match="capacity"):
        mg_summaries(df, "k", 0)
    with pytest.raises(ValueError, match="min_share"):
        heavy_hitters(df, "k", 8, min_share=1.5)
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(df, "k", 8, min_count=0)


def test_bigint_keys_above_2_53_stay_exact(spark):
    """Regression: the per-partition fold used to append a None sentinel
    to the integer key list, coercing pandas to float64 and silently
    rounding keys above 2^53 (2^60+1 became 2^60). The sentinel now
    travels in its own frame, so bigint keys round-trip bit-exact."""
    k1, k2 = (1 << 60) + 1, (1 << 60) + 3
    df = spark.createDataFrame(
        [(k1,)] * 40 + [(k2,)] * 20, "key bigint"
    ).coalesce(1)
    merged = mg_merge(mg_summaries(df, "key", capacity=8), 8).collect()
    assert {r["key"] for r in merged} == {k1, k2}
    assert {r["key"]: r["est"] for r in merged} == {k1: 40, k2: 20}
