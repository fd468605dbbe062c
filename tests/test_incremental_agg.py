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


def test_signed_count_retraction(spark):
    """The retractable count: modeled as sum over a ±1 sign column, a
    compensating delete batch genuinely decrements — and the folded
    rollup equals a recompute over the surviving rows."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.incremental_agg import (
        agg_snapshot,
        apply_agg_delta,
    )

    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "k STRING, v DOUBLE"
    )
    measures = {"n": ("signed_count", "__sign"), "total": ("sum", "v")}
    rollup = agg_snapshot(
        base.withColumn("__sign", F.lit(1)), ["k"], measures
    )
    assert {(r["k"], r["n"]) for r in rollup.collect()} == {
        ("a", 2), ("b", 1),
    }
    # compensating batch: delete one 'a' row (sign -1, negated value),
    # insert one 'c' row
    delta = spark.createDataFrame(
        [("a", -20.0, -1), ("c", 7.0, 1)], "k STRING, v DOUBLE, __sign INT"
    )
    folded = apply_agg_delta(
        rollup, delta, ["k"], measures, allow_negative=True
    )
    survivors = spark.createDataFrame(
        [("a", 10.0), ("b", 5.0), ("c", 7.0)], "k STRING, v DOUBLE"
    ).withColumn("__sign", F.lit(1))
    recomputed = agg_snapshot(survivors, ["k"], measures)
    got = {(r["k"], r["n"], r["total"]) for r in folded.collect()}
    want = {(r["k"], r["n"], r["total"]) for r in recomputed.collect()}
    assert got == want == {("a", 1, 10.0), ("b", 1, 5.0), ("c", 1, 7.0)}


def test_plain_count_is_not_retractable_documented(spark):
    """Regression pin for the documented limitation: a 'count' measure
    treats every delta row as +1 even under allow_negative — the
    retraction path is signed_count."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.incremental_agg import (
        agg_snapshot,
        apply_agg_delta,
    )

    base = spark.createDataFrame([("a", 1.0)], "k STRING, v DOUBLE")
    measures = {"n": ("count", "*")}
    rollup = agg_snapshot(base, ["k"], measures)
    delta = spark.createDataFrame([("a", -1.0)], "k STRING, v DOUBLE")
    folded = apply_agg_delta(rollup, delta, ["k"], measures,
                             allow_negative=True)
    assert folded.first()["n"] == 2  # counted the delete row: documented
