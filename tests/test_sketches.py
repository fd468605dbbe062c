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
