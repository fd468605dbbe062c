"""Approximate aggregates (sketches): the at-scale swap-ins for exact
distinct counts and quantiles. Engine-specific estimates can't hash-match
a DuckDB oracle, so the gate is tolerance against the exact computation
— the same contract a user accepts when choosing the sketch."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from mysql_syncer_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "events")


def test_approx_count_distinct_within_rsd(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.08 * n), (k, n, approx[k])


def test_approx_percentile_close_to_exact(events):
    row = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx_p50"),
        F.expr("percentile(value, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(value, 0.99, 1000)").alias("approx_p99"),
    ).first()
    spread = events.agg(
        (F.max("value") - F.min("value")).alias("r")
    ).first()["r"]
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.05 * spread
    assert abs(row["approx_p99"] - row["exact_p99"]) <= 0.05 * spread


def test_hll_rollup_estimates_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.sketches import (
        hll_estimate_over,
        hll_rollup,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    grain = events.withColumn("day", F.to_date("ts"))
    rollup = hll_rollup(grain, ["day", "event_type"], "user_id")
    # estimate per event_type from the daily grain vs exact
    est = {
        r["event_type"]: r["n_distinct_est"]
        for r in hll_estimate_over(rollup, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in grain.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)
    # grand total across all grains
    total = hll_estimate_over(rollup, []).first()["n_distinct_est"]
    exact_total = grain.select("user_id").distinct().count()
    assert abs(total - exact_total) / exact_total < 0.05


def test_hll_merge_equals_direct_union(spark, sf_dir):
    """The maintenance property: folding batch state into stored state
    must estimate EXACTLY what a direct one-shot rollup over all the data
    estimates — merge loses nothing."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.sketches import (
        hll_estimate_over,
        hll_rollup,
        hll_rollup_merge,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    old = events.where(F.col("event_id") % 3 != 0)
    new = events.where(F.col("event_id") % 3 == 0)
    grain = ["day", "event_type"]
    merged = hll_rollup_merge(
        hll_rollup(old, grain, "user_id"),
        hll_rollup(new, grain, "user_id"),
        grain,
    )
    direct = hll_rollup(events, grain, "user_id")
    a = {
        tuple(r[g] for g in ["event_type"]) + (r["n_distinct_est"],)
        for r in hll_estimate_over(merged, ["event_type"]).collect()
    }
    b = {
        tuple(r[g] for g in ["event_type"]) + (r["n_distinct_est"],)
        for r in hll_estimate_over(direct, ["event_type"]).collect()
    }
    assert a == b
