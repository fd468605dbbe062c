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
