"""Bucketized equi-key-free interval join (operators/interval.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.interval import interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate([0, 30, 59, 60, 90, 3600, 7199])],
        "pid long, ts timestamp",
    )
    windows = spark.createDataFrame(
        [
            (100, _ts(0), _ts(60)),        # covers 0,30,59 (60 excluded)
            (101, _ts(45), _ts(100)),      # covers 59,60,90
            (102, _ts(7000), _ts(7200)),   # covers 7199
        ],
        "wid long, w_start timestamp, w_end timestamp",
    )
    return points, windows


EXPECTED = {(0, 100), (1, 100), (2, 100), (2, 101), (3, 101), (4, 101), (6, 102)}


def test_matches_exact_predicate(frames):
    points, windows = frames
    out = interval_join(points, windows, "ts", "w_start", "w_end", 60)
    got = {(r["pid"], r["wid"]) for r in out.collect()}
    assert got == EXPECTED


def test_no_duplicate_pairs_and_bucket_width_invariance(frames):
    points, windows = frames
    for width in (1, 7, 60, 86400):
        out = interval_join(points, windows, "ts", "w_start", "w_end", width)
        rows = [(r["pid"], r["wid"]) for r in out.collect()]
        assert len(rows) == len(set(rows)), f"dup pairs at width={width}"
        assert set(rows) == EXPECTED, f"width={width}"


def test_inclusive_end(frames):
    points, windows = frames
    out = interval_join(
        points, windows, "ts", "w_start", "w_end", 60, inclusive_end=True
    )
    got = {(r["pid"], r["wid"]) for r in out.collect()}
    # ts=60 now also matches window 100's closed right edge
    assert got == EXPECTED | {(3, 100)}


def test_plan_is_hash_join_not_nested_loop(frames):
    points, windows = frames
    out = interval_join(points, windows, "ts", "w_start", "w_end", 60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_validation(frames):
    points, windows = frames
    with pytest.raises(ValueError):
        interval_join(points, windows, "ts", "w_start", "w_end", 0)
    with pytest.raises(ValueError):
        interval_join(
            points.withColumnRenamed("pid", "wid"),
            windows, "ts", "w_start", "w_end", 60,
        )
