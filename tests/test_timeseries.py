"""resample_gap_fill: grid completeness, zero-fill, forward fill."""

import datetime

import pytest
from pyspark.sql import functions as F


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour, 0, 0)


@pytest.fixture(scope="module")
def stream(spark):
    rows = [
        # user 1: events on days 1 and 4 (gap at 2-3), two on day 1
        (101, _ts(1, 5), 1, 10.0),
        (102, _ts(1, 9), 1, 20.0),
        (103, _ts(4, 1), 1, 30.0),
        # user 2: single event — single-bucket grid
        (201, _ts(2, 3), 2, 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_gap_fill_grid_and_ffill(stream):
    from mysql_syncer_spark.operators.timeseries import resample_gap_fill

    out = resample_gap_fill(stream, "user_id", "ts", "value", step="day")
    rows = {(r["user_id"], r["bucket"].day): r for r in out.collect()}
    # user 1: contiguous days 1..4 despite no events on 2-3
    assert {(d) for (u, d) in rows if u == 1} == {1, 2, 3, 4}
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 2)]["n_events"] == 0
    assert rows[(1, 3)]["n_events"] == 0
    assert rows[(1, 4)]["n_events"] == 1
    # last value of day 1 is the later event (ts 09:00 → 20.0), carried
    # through the silent days, replaced on day 4
    assert rows[(1, 1)]["value_ffill"] == 20.0
    assert rows[(1, 2)]["value_ffill"] == 20.0
    assert rows[(1, 3)]["value_ffill"] == 20.0
    assert rows[(1, 4)]["value_ffill"] == 30.0
    # user 2: exactly one bucket
    assert {(d) for (u, d) in rows if u == 2} == {2}
    assert rows[(2, 2)]["n_events"] == 1 and rows[(2, 2)]["value_ffill"] == 5.0


def test_gap_fill_hour_step(stream):
    from mysql_syncer_spark.operators.timeseries import resample_gap_fill

    out = resample_gap_fill(stream, "user_id", "ts", "value", step="hour")
    u2 = out.where(F.col("user_id") == 2).collect()
    assert len(u2) == 1  # single event → single hourly bucket
    u1 = out.where(F.col("user_id") == 1).count()
    # from 01-01 05:00 through 01-04 01:00 inclusive = 69 hourly buckets
    assert u1 == 69


def test_gap_fill_bad_step(stream):
    from mysql_syncer_spark.operators.timeseries import resample_gap_fill

    with pytest.raises(ValueError):
        resample_gap_fill(stream, "user_id", "ts", "value", step="month")


class TestRollingZscore:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, value double"
        )

    def test_planted_spike_flagged(self, spark):
        import datetime as dt

        from mysql_syncer_spark.operators.timeseries import rolling_zscore

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, i, t0 + dt.timedelta(minutes=i), 10.0 + (i % 3) * 0.5)
            for i in range(10)
        ]
        rows.append((1, 10, t0 + dt.timedelta(minutes=10), 500.0))
        out = rolling_zscore(
            self._frame(spark, rows),
            key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", window=20, min_periods=5, threshold=3.0,
        ).collect()
        by_id = {r.event_id: r for r in out}
        assert by_id[10].is_anomaly and by_id[10].zscore > 3.0
        assert not any(r.is_anomaly for r in out if r.event_id != 10)

    def test_warmup_and_constant_history_are_null(self, spark):
        import datetime as dt

        from mysql_syncer_spark.operators.timeseries import rolling_zscore

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, i, t0 + dt.timedelta(minutes=i), 7.0) for i in range(8)
        ]
        out = rolling_zscore(
            self._frame(spark, rows),
            key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", window=20, min_periods=5,
        ).collect()
        # first 5 rows lack history; the rest have sd == 0 — all NULL,
        # none anomalous
        assert all(r.zscore is None and not r.is_anomaly for r in out)

    def test_hand_computed_zscore(self, spark):
        import datetime as dt
        import statistics

        from mysql_syncer_spark.operators.timeseries import rolling_zscore

        t0 = dt.datetime(2024, 1, 1)
        hist = [3.0, 5.0, 4.0, 6.0, 2.0]
        rows = [
            (1, i, t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate(hist)
        ] + [(1, 5, t0 + dt.timedelta(minutes=5), 9.0)]
        out = rolling_zscore(
            self._frame(spark, rows),
            key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", window=20, min_periods=5,
        ).collect()
        want = (9.0 - statistics.mean(hist)) / statistics.stdev(hist)
        got = [r.zscore for r in out if r.event_id == 5][0]
        assert abs(got - round(want, 6)) < 1e-9

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.timeseries import rolling_zscore

        df = self._frame(spark, [])
        with _pytest.raises(ValueError):
            rolling_zscore(df, "user_id", ["ts"], "value", window=0)

    def test_single_window_exchange(self, spark, sf_dir):
        """One hash exchange on the key, no joins — the whole operator
        must ride a single window shuffle."""
        import re

        from mysql_syncer_spark import queries as registry

        df = registry.queries()["anomaly_zscore_events"](spark, sf_dir)
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Join" not in plan, plan
        # formatted explain puts the partitioning in the Arguments line
        n_hash_exchanges = len(
            re.findall(r"Arguments: hashpartitioning", plan)
        )
        assert n_hash_exchanges == 1, plan


class TestAsofJoin:
    @staticmethod
    def _frames(spark):
        import datetime as dt

        T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
        left = spark.createDataFrame(
            [(1, T(10), 100), (1, T(30), 101), (2, T(5), 200)],
            "k long, lt timestamp, lid long",
        )
        right = spark.createDataFrame(
            [(1, T(10), "a", None), (1, T(20), "b", 5.0),
             (1, T(40), "c", 6.0)],
            "k long, rt timestamp, name string, v double",
        )
        return left, right

    def test_backward_inclusive_and_null_column(self, spark):
        from mysql_syncer_spark.operators.timeseries import asof_join

        left, right = self._frames(spark)
        got = {
            r["lid"]: (r["asof_name"], r["asof_v"])
            for r in asof_join(
                left, right, "k", "lt", "rt", ["name", "v"], "backward"
            ).collect()
        }
        # equal-time right row IS visible (inclusive); its NULL v stays
        # NULL — the struct carry never falls back to an older row
        assert got[100] == ("a", None)
        assert got[101] == ("b", 5.0)
        assert got[200] == (None, None)

    def test_forward(self, spark):
        from mysql_syncer_spark.operators.timeseries import asof_join

        left, right = self._frames(spark)
        got = {
            r["lid"]: (r["asof_name"], r["asof_v"])
            for r in asof_join(
                left, right, "k", "lt", "rt", ["name", "v"], "forward"
            ).collect()
        }
        assert got[100] == ("a", None)   # inclusive at equal time
        assert got[101] == ("c", 6.0)    # next right after t30
        assert got[200] == (None, None)

    def test_tolerance_nulls_out_far_matches(self, spark):
        from mysql_syncer_spark.operators.timeseries import asof_join

        left, right = self._frames(spark)
        got = {
            r["lid"]: r["asof_name"]
            for r in asof_join(
                left, right, "k", "lt", "rt", ["name", "v"],
                "backward", tolerance_seconds=300,
            ).collect()
        }
        assert got[100] == "a"       # 0-min gap
        assert got[101] is None      # 10-min gap > 5-min tolerance
        # left row still survives (left-join semantics)
        assert 200 in got

    def test_time_tie_break_is_stated(self, spark):
        import datetime as dt

        from mysql_syncer_spark.operators.timeseries import asof_join

        T = dt.datetime(2024, 1, 1)
        left = spark.createDataFrame([(1, T, 9)], "k long, lt timestamp, lid long")
        right = spark.createDataFrame(
            [(1, T, 7), (1, T, 3)], "k long, rt timestamp, rid long"
        )
        bw = asof_join(left, right, "k", "lt", "rt", ["rid"],
                       "backward").collect()[0]
        fw = asof_join(left, right, "k", "lt", "rt", ["rid"],
                       "forward").collect()[0]
        assert bw["asof_rid"] == 7   # backward: MAX right key on ties
        assert fw["asof_rid"] == 3   # forward: MIN right key on ties

    def test_direction_validation(self, spark):
        from mysql_syncer_spark.operators.timeseries import asof_join

        left, right = self._frames(spark)
        with pytest.raises(ValueError, match="direction"):
            asof_join(left, right, "k", "lt", "rt", ["name"], "sideways")

    def test_nearest_picks_closer_side(self, spark):
        from mysql_syncer_spark.operators.timeseries import asof_join

        left, right = self._frames(spark)
        got = {
            r["lid"]: r["asof_name"]
            for r in asof_join(
                left, right, "k", "lt", "rt", ["name", "v"], "nearest"
            ).collect()
        }
        assert got[100] == "a"    # exact hit (gap 0 both ways -> backward)
        assert got[101] == "b"    # t30: b is 10 min back, c is 10 min fwd
        #                           -> equal gap, backward wins (pandas)
        assert got[200] is None   # key 2 has no right rows at all

    def test_nearest_equal_gap_prefers_backward(self, spark):
        import datetime as dt

        from mysql_syncer_spark.operators.timeseries import asof_join

        T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
        left = spark.createDataFrame(
            [(1, T(10), 9)], "k long, lt timestamp, lid long"
        )
        right = spark.createDataFrame(
            [(1, T(4), "back"), (1, T(16), "fwd"), (1, T(30), "far")],
            "k long, rt timestamp, name string",
        )
        row = asof_join(
            left, right, "k", "lt", "rt", ["name"], "nearest"
        ).collect()[0]
        assert row["asof_name"] == "back"

    def test_nearest_one_sided(self, spark):
        import datetime as dt

        from mysql_syncer_spark.operators.timeseries import asof_join

        T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
        # left BEFORE all right rows: only the forward carry matches
        left = spark.createDataFrame(
            [(1, T(0), 9)], "k long, lt timestamp, lid long"
        )
        right = spark.createDataFrame(
            [(1, T(20), "only")], "k long, rt timestamp, name string"
        )
        row = asof_join(
            left, right, "k", "lt", "rt", ["name"], "nearest"
        ).collect()[0]
        assert row["asof_name"] == "only"

    def test_nearest_with_tolerance(self, spark):
        from mysql_syncer_spark.operators.timeseries import asof_join

        left, right = self._frames(spark)
        got = {
            r["lid"]: r["asof_name"]
            for r in asof_join(
                left, right, "k", "lt", "rt", ["name", "v"],
                "nearest", tolerance_seconds=300,
            ).collect()
        }
        assert got[100] == "a"    # 0-gap survives
        assert got[101] is None   # nearest is 10 min away > 5-min tol
        assert 200 in got         # left-join row survival


# ---------------------------------------------------------------------------
# EWMA (E131)
# ---------------------------------------------------------------------------


def test_ewma_matches_pandas_and_hand_recursion(spark):
    import numpy as np
    import pandas as pd

    from mysql_syncer_spark.operators.timeseries import ewma

    rng = np.random.RandomState(3)
    xs = rng.randn(25) * 10 + 50
    rows = [
        ("k", float(i), float(x)) for i, x in enumerate(xs)
    ] + [("other", float(i), 0.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, ["k"], "t", "v", alpha=0.3).collect()
    }
    ref = pd.Series(xs).ewm(alpha=0.3, adjust=False).mean()
    for i, want in enumerate(ref):
        assert got[("k", float(i))] == pytest.approx(want, abs=1e-12)
    # hand recursion spot check
    y = xs[0]
    for i in range(1, 4):
        y = 0.7 * y + 0.3 * xs[i]
        assert got[("k", float(i))] == pytest.approx(y, abs=1e-12)
    # keys are independent: the zero series stays at zero
    assert all(got[("other", float(i))] == 0.0 for i in range(5))


def test_ewma_null_propagates_previous(spark):
    from mysql_syncer_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("k", 0.0, 10.0), ("k", 1.0, None), ("k", 2.0, 20.0)],
        "k string, t double, v double",
    )
    got = {
        r["t"]: r["ewma"]
        for r in ewma(df, ["k"], "t", "v", alpha=0.5).collect()
    }
    assert got[0.0] == 10.0
    assert got[1.0] == 10.0          # NULL: carry the smoothed value
    assert got[2.0] == pytest.approx(15.0)


def test_ewma_validation(spark):
    from mysql_syncer_spark.operators.timeseries import ewma

    df = spark.createDataFrame([("k", 0.0, 1.0)], "k string, t double, v double")
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, ["k"], "t", "v", alpha=0.0)
    with pytest.raises(ValueError, match="key_cols"):
        ewma(df, [], "t", "v", alpha=0.5)


def test_ewma_guard_raises_on_hot_key(spark):
    """Round-9 VERDICT item 7: the whole-key Arrow-group contract must
    fail LOUDLY past max_points_per_key, not OOM at 100x."""
    from mysql_syncer_spark.operators.timeseries import ewma

    df = spark.range(2000).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        (F.col("id") % 17).cast("double").alias("v"),
    )
    with pytest.raises(Exception, match="max_points_per_key"):
        ewma(df, ["k"], "t", "v", alpha=0.3,
             max_points_per_key=1000).collect()
    # a cap above the series size passes
    assert ewma(df, ["k"], "t", "v", alpha=0.3,
                max_points_per_key=5000).count() == 2000


def test_ewma_chunked_equals_whole_series_million_points(spark):
    """The exact carry-in fold: a synthetic 10^6-point key chunk-folds
    to equality with the whole-series recursion (float tolerance; the
    association order differs)."""
    import numpy as np

    from mysql_syncer_spark.operators.timeseries import ewma, ewma_chunked

    n = 1_000_000
    df = spark.range(n).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("t"),
        F.when(F.col("id") % 97 == 0, F.lit(None))  # NULL holes too
        .otherwise(F.sin(F.col("id").cast("double")) * 100)
        .alias("v"),
        (F.col("id") / F.lit(50_000)).cast("long").alias("chunk"),
    )
    whole = (
        ewma(df, ["k"], "t", "v", alpha=0.05, max_points_per_key=None)
        .select("t", "ewma").toPandas().sort_values("t")
    )
    chunked = (
        ewma_chunked(df, ["k"], "t", "v", alpha=0.05, chunk_col="chunk")
        .select("t", "ewma").toPandas().sort_values("t")
    )
    a = whole["ewma"].to_numpy()
    b = chunked["ewma"].to_numpy()
    assert len(a) == len(b) == n
    assert np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)


def test_ewma_chunked_small_cases_and_null_chunks(spark):
    """Boundary semantics: leading NULLs, an all-NULL middle chunk
    (state must ride through), multiple keys, one-row chunks."""
    import math

    from mysql_syncer_spark.operators.timeseries import ewma, ewma_chunked

    rows = [
        ("a", 0, None, 0), ("a", 1, 10.0, 0), ("a", 2, 20.0, 0),
        ("a", 3, None, 1), ("a", 4, None, 1),   # all-NULL chunk
        ("a", 5, 40.0, 2), ("a", 6, None, 2),
        ("b", 0, 5.0, 0), ("b", 1, 7.0, 1),     # one-row chunks
    ]
    df = spark.createDataFrame(
        rows, "k string, t long, v double, chunk long"
    )
    want = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, ["k"], "t", "v", alpha=0.5).collect()
    }
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma_chunked(
            df, ["k"], "t", "v", alpha=0.5, chunk_col="chunk"
        ).collect()
    }
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        if w is None or (isinstance(w, float) and math.isnan(w)):
            assert g is None or math.isnan(g), key
        else:
            assert abs(g - w) < 1e-12, (key, g, w)
