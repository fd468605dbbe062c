"""Closed-form stats (operators/stats.py): numpy-reference equality
on hand-built series, pairwise-complete NULL semantics, degenerate
cases (constant x, undersized pairs)."""

import numpy as np
import pytest

from mysql_syncer_spark.operators.stats import (
    correlation_matrix,
    group_trends,
)


def test_corr_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.randn(40)
    y = 2 * x + rng.randn(40) * 0.1   # strongly correlated
    z = rng.randn(40)                  # independent
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert got[("x", "y")] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-9)
    assert got[("x", "z")] == pytest.approx(np.corrcoef(x, z)[0, 1], abs=1e-9)
    assert abs(got[("x", "y")]) > 0.99 > abs(got[("x", "z")])


def test_corr_pairwise_complete_nulls_and_min_rows(spark):
    rows = [
        (1.0, 2.0, None),
        (2.0, 4.0, 1.0),
        (3.0, 6.0, None),
        (4.0, None, 2.0),
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    c, n = out[("x", "y")]
    assert n == 3 and c == pytest.approx(1.0)   # perfect on complete rows
    c, n = out[("x", "z")]
    assert n == 2                                # two complete pairs
    # y-z has ONE complete row: below min_rows -> NULL, not a number
    c, n = out[("y", "z")]
    assert n == 1 and c is None


def test_trends_match_numpy_polyfit(spark):
    xs = np.arange(30, dtype=float)
    ys = 3.5 * xs + 7.0 + np.sin(xs)  # near-linear
    rows = [("a", float(x), float(y)) for x, y in zip(xs, ys)] + [
        ("b", float(x), 5.0) for x in xs  # flat: slope 0, r2 undefined-ish
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: r for r in group_trends(df, ["g"], "x", "y").collect()
    }
    slope, intercept = np.polyfit(xs, ys, 1)
    assert got["a"]["slope"] == pytest.approx(slope, abs=1e-9)
    assert got["a"]["intercept"] == pytest.approx(intercept, abs=1e-9)
    assert got["a"]["r2"] > 0.999 and got["a"]["n"] == 30
    assert got["b"]["slope"] == pytest.approx(0.0, abs=1e-12)


def test_trend_constant_x_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 1.0, 2.0)], "g string, x double, y double"
    )
    r = group_trends(df, ["g"], "x", "y").first()
    assert r["slope"] is None  # vertical fit undefined


def test_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="two value columns"):
        correlation_matrix(df, ["x"])
