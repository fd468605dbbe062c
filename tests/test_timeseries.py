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
