"""Sequence analytics: transition matrix, attribution, unpivot law
(operators/sequence.py, queries E105-E107)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.sequence import (
    attribute_conversions,
    event_transitions,
)

T0 = dt.datetime(2024, 1, 1)


def _t(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: view -> click -> buy -> click
        (10, 1, _t(0), "view"),
        (11, 1, _t(1), "click"),
        (12, 1, _t(2), "buy"),
        (13, 1, _t(3), "click"),
        # user 2: view -> view -> buy
        (20, 2, _t(0), "view"),
        (21, 2, _t(1), "view"),
        (22, 2, _t(2), "buy"),
        # user 3: single event — contributes no transition
        (30, 3, _t(0), "buy"),
        # user 4: equal timestamps — event_id tie decides the order
        (41, 4, _t(0), "view"),
        (40, 4, _t(0), "click"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_transition_counts_and_probs(events):
    out = event_transitions(events, "user_id", "ts", "event_type",
                            "event_id")
    got = {(r["prev_type"], r["next_type"]): (r["n"], r["prob"])
           for r in out.collect()}
    # view fans out 3 ways (u1 view->click, u2 view->view, view->buy)
    assert got[("view", "click")] == (1, 0.333333)
    assert got[("view", "view")] == (1, 0.333333)
    assert got[("view", "buy")] == (1, 0.333333)
    # user 4's tie: event_id 40 (click) precedes 41 (view)
    assert got[("click", "view")] == (1, 0.5)
    assert got[("click", "buy")] == (1, 0.5)
    assert got[("buy", "click")] == (1, 1.0)
    assert len(got) == 6
    # row-stochastic up to the 6-decimal rounding
    sums = (out.groupBy("prev_type").agg(F.sum("prob").alias("s"))
            .collect())
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-5


def test_transition_single_event_key_absent(events):
    out = event_transitions(events, "user_id", "ts", "event_type",
                            "event_id")
    # user 3's lone 'buy' must not appear as a prev with no successor
    assert out.where(
        (F.col("prev_type") == "buy") & (F.col("next_type") == "buy")
    ).count() == 0


def test_attribution_last_vs_first(events):
    last = attribute_conversions(
        events, "user_id", "ts", "event_type", "event_id",
        conversion_type="buy", touch_types=["view", "click"],
        model="last",
    )
    got = {r["event_id"]: r for r in last.collect()}
    # user 1's buy at t2: last touch = click@t1
    assert got[12]["touch_type"] == "click"
    assert got[12]["touch_ts"] == _t(1)
    assert got[12]["micros_to_convert"] == 60_000_000
    # user 2's buy: last touch = view@t1
    assert got[22]["touch_type"] == "view"
    # user 3's buy: no prior touch -> unattributed NULLs
    assert got[30]["touch_type"] is None
    assert got[30]["micros_to_convert"] is None
    assert len(got) == 3

    first = attribute_conversions(
        events, "user_id", "ts", "event_type", "event_id",
        conversion_type="buy", touch_types=["view", "click"],
        model="first",
    )
    fgot = {r["event_id"]: r for r in first.collect()}
    # user 1's first touch is the view@t0
    assert fgot[12]["touch_type"] == "view"
    assert fgot[12]["micros_to_convert"] == 120_000_000
    assert fgot[22]["touch_type"] == "view"
    assert fgot[22]["touch_ts"] == _t(0)


def test_attribution_bad_model(events):
    with pytest.raises(ValueError, match="model"):
        attribute_conversions(
            events, "user_id", "ts", "event_type", "event_id",
            conversion_type="buy", touch_types=["view"], model="linear",
        )


def test_pivot_unpivot_round_trip(spark):
    """unpivot(pivot(x)) restores the long form (with explicit zeros
    for absent cells) — the E103/E107 inverse law."""
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "b")]
    df = spark.createDataFrame(rows, "k long, t string")
    types = ["a", "b"]
    wide = (
        df.groupBy("k").pivot("t", types).agg(F.count(F.lit(1)))
        .select("k", *[F.coalesce(F.col(t), F.lit(0)).cast("long")
                       .alias(t) for t in types])
    )
    long = wide.unpivot(["k"], types, "t", "cnt")
    got = {(r["k"], r["t"]): r["cnt"] for r in long.collect()}
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "a"): 0, (2, "b"): 1}


def test_session_paths(spark):
    from mysql_syncer_spark.operators.sequence import session_paths

    rows = [
        # user 1, session A: a>b ; session B (65 min later): a>b
        (1, 1, _t(0), "a"), (2, 1, _t(1), "b"),
        (3, 1, _t(66), "a"), (4, 1, _t(67), "b"),
        # user 2, one session: a>b
        (5, 2, _t(0), "a"), (6, 2, _t(1), "b"),
        # user 3, one long session: truncation to first 3 steps
        (7, 3, _t(0), "a"), (8, 3, _t(1), "b"), (9, 3, _t(2), "c"),
        (10, 3, _t(3), "d"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = session_paths(
        df, "user_id", "ts", "event_type", "event_id",
        gap="30 MINUTE", max_steps=3, top_k=10,
    ).collect()
    got = {r["path"]: (r["n_sessions"], r["share"]) for r in out}
    # 4 sessions total: 3x 'a>b', 1x 'a>b>c' (d truncated away)
    assert got == {"a>b": (3, 0.75), "a>b>c": (1, 0.25)}
    # ordering: most frequent first
    assert out[0]["path"] == "a>b"
