"""Ordered-funnel cascade (operators/funnel.py)."""

import datetime as dt

import pytest

from mysql_syncer_spark.operators.funnel import funnel

T0 = dt.datetime(2024, 1, 1)


def _t(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: full ordered chain
        (1, _t(0), "view"), (1, _t(5), "click"), (1, _t(9), "buy"),
        # user 2: buy BEFORE click — chain breaks at step 2
        (2, _t(0), "view"), (2, _t(8), "click"), (2, _t(3), "buy"),
        # user 3: never entered (no view)
        (3, _t(1), "click"), (3, _t(2), "buy"),
        # user 4: greedy trap — earliest click is before the view, but a
        # later one continues the chain; greedy must still complete
        (4, _t(5), "view"), (4, _t(2), "click"), (4, _t(7), "click"),
        (4, _t(8), "buy"),
        # user 5: simultaneous timestamps are NOT strictly after
        (5, _t(0), "view"), (5, _t(0), "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_stages(events):
    out = funnel(events, "user_id", "ts", "event_type",
                 ["view", "click", "buy"])
    got = {r["user_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 4, 5}          # user 3 never entered
    assert got[1]["n_steps"] == 3
    assert got[1]["t2"] == _t(9)
    # break at buy-before-click ordering
    assert got[2]["n_steps"] == 2 and got[2]["t2"] is None
    # greedy completeness: the pre-view click is skipped, chain completes
    assert got[4]["n_steps"] == 3
    assert got[4]["t1"] == _t(7)
    # strict ordering: ts == prev does not advance
    assert got[5]["n_steps"] == 1 and got[5]["t1"] is None


def test_funnel_single_step_and_validation(events):
    out = funnel(events, "user_id", "ts", "event_type", ["view"])
    got = {r["user_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 4, 5}
    assert all(r["n_steps"] == 1 for r in got.values())
    with pytest.raises(ValueError):
        funnel(events, "user_id", "ts", "event_type", [])


def test_funnel_partitioning_independent(events):
    a = funnel(events, "user_id", "ts", "event_type", ["view", "click"])
    b = funnel(
        events.repartition(7), "user_id", "ts", "event_type",
        ["view", "click"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cohort_retention(spark):
    import datetime as dt

    from mysql_syncer_spark.operators.funnel import cohort_retention

    w0 = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        # users 1,2 start week 0; user 1 returns weeks 1 and 2
        (1, w0), (1, w0 + dt.timedelta(days=8)), (1, w0 + dt.timedelta(days=15)),
        (2, w0 + dt.timedelta(days=2)),
        # user 3 starts week 1, returns week 3
        (3, w0 + dt.timedelta(days=9)), (3, w0 + dt.timedelta(days=22)),
        # duplicate activity in one week counts once
        (2, w0 + dt.timedelta(days=3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(df, "user_id", "ts", unit="week")
    got = {(r["cohort"].isoformat(), r["offset"]): r["n_active"]
           for r in out.collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1,2 in their own week
        ("2024-01-01", 1): 1,   # user 1 retained
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,   # user 3's cohort
        ("2024-01-08", 2): 1,
    }


def test_cohort_retention_units(spark):
    import datetime as dt

    import pytest as _pytest

    from mysql_syncer_spark.operators.funnel import cohort_retention

    d0 = dt.datetime(2024, 1, 31)
    df = spark.createDataFrame(
        [(1, d0), (1, d0 + dt.timedelta(days=1))], "user_id long, ts timestamp"
    )
    monthly = {(r["offset"]): r["n_active"]
               for r in cohort_retention(df, "user_id", "ts", "month").collect()}
    assert monthly == {0: 1, 1: 1}  # Jan 31 -> Feb 1 is a month boundary
    with _pytest.raises(ValueError):
        cohort_retention(df, "user_id", "ts", "year")


class TestTransitionEntropy:
    """E191 conditional-entropy laws (operators/sequence.py)."""

    def _run(self, spark, seqs, cats):
        from mysql_syncer_spark.operators.sequence import (
            transition_entropy,
        )

        rows = [
            (u, i, t)
            for u, seq in enumerate(seqs)
            for i, t in enumerate(seq)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_type string"
        )
        return {
            r.prev_type: r
            for r in transition_entropy(
                df, "user_id", "ts", "event_type", "ts", cats
            ).collect()
        }

    def test_deterministic_successor_zero_entropy(self, spark):
        out = self._run(
            spark, [["a", "b"], ["a", "b"], ["a", "b", "c"]],
            ["a", "b", "c"],
        )
        a = out["a"]
        assert a.n_transitions == 3
        assert a.entropy == 0.0 and a.perplexity == 1.0

    def test_uniform_successors_max_entropy(self, spark):
        import math

        out = self._run(
            spark,
            [["a", "b"], ["a", "c"]],
            ["a", "b", "c"],
        )
        a = out["a"]
        # two equally likely successors out of a 3-cat list
        assert abs(a.entropy - math.log(2)) < 1e-6
        assert abs(a.norm_entropy - math.log(2) / math.log(3)) < 1e-6
        assert abs(a.perplexity - 2.0) < 1e-6

    def test_out_of_list_next_excluded(self, spark):
        out = self._run(
            spark,
            [["a", "b"], ["a", "zz"]],   # zz not a category
            ["a", "b"],
        )
        a = out["a"]
        assert a.n_transitions == 1 and a.entropy == 0.0
