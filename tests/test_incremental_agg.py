"""Incremental rollup maintenance (operators/incremental_agg.py)."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.incremental_agg import (
    agg_snapshot,
    apply_agg_delta,
)

MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@pytest.fixture(scope="module")
def frames(spark):
    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k string, v long"
    )
    delta = spark.createDataFrame(
        [("a", 1), ("c", 99)], "k string, v long"  # existing + NEW group
    )
    return base, delta


def test_fold_equals_recompute(frames):
    base, delta = frames
    folded = apply_agg_delta(
        agg_snapshot(base, ["k"], MEASURES), delta, ["k"], MEASURES
    )
    recomputed = agg_snapshot(base.unionByName(delta), ["k"], MEASURES)
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_untouched_groups_pass_through(frames):
    base, delta = frames
    rollup = agg_snapshot(base, ["k"], MEASURES)
    folded = apply_agg_delta(rollup, delta, ["k"], MEASURES)
    b_row = {r["k"]: r for r in rollup.collect()}["b"]
    f_row = {r["k"]: r for r in folded.collect()}["b"]
    assert tuple(b_row) == tuple(f_row)  # bit-identical, no arithmetic


def test_compensating_delta_for_sum_count(spark, frames):
    base, _ = frames
    measures = {"n": ("count", "*"), "total": ("sum", "v")}
    rollup = agg_snapshot(base, ["k"], measures)
    # retract one ("a", 20) row: count delta -1, sum delta -20
    comp = spark.createDataFrame([("a", -20, -1)], "k string, v long, c long")
    # counts need an explicit sum-of-c measure for retractions
    folded = apply_agg_delta(
        rollup.withColumnRenamed("n", "n_"), comp, ["k"],
        {"n_": ("sum", "c"), "total": ("sum", "v")},
        allow_negative=True,
    )
    got = {r["k"]: r for r in folded.collect()}
    assert got["a"]["n_"] == 1 and got["a"]["total"] == 10


def test_minmax_retraction_rejected(frames):
    base, delta = frames
    rollup = agg_snapshot(base, ["k"], MEASURES)
    with pytest.raises(ValueError):
        apply_agg_delta(rollup, delta, ["k"], MEASURES, allow_negative=True)
    with pytest.raises(ValueError):
        agg_snapshot(base, ["k"], {"x": ("avg", "v")})


def test_fold_is_associative_over_batches(spark, frames):
    base, _ = frames
    d1 = spark.createDataFrame([("a", 7)], "k string, v long")
    d2 = spark.createDataFrame([("b", 3), ("d", 1)], "k string, v long")
    one_by_one = apply_agg_delta(
        apply_agg_delta(agg_snapshot(base, ["k"], MEASURES), d1, ["k"], MEASURES),
        d2, ["k"], MEASURES,
    )
    all_at_once = apply_agg_delta(
        agg_snapshot(base, ["k"], MEASURES),
        d1.unionByName(d2), ["k"], MEASURES,
    )
    assert sorted(map(tuple, one_by_one.collect())) == sorted(
        map(tuple, all_at_once.collect())
    )
