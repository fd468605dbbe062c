"""Laws for operators/rules.py — single-pass rule-funnel accounting."""

import random

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.rules import (
    KEPT,
    first_failing_rule,
    rule_funnel,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, words int, lang string")


def _rules():
    return [
        ("min_words", F.col("words") >= 20),
        ("lang_en", F.col("lang") == "en"),
        ("max_words", F.col("words") <= 85),
    ]


class TestFirstFailing:
    def test_cascade_order_and_null_fails(self, spark):
        df = _mk(
            spark,
            [
                (1, 10, "fr"),  # fails 0 AND 1 -> first is 0
                (2, 50, "en"),  # kept
                (3, 50, "fr"),  # fails 1
                (4, None, "en"),  # NULL verdict fails 0
                (5, 90, "en"),  # fails 2
            ],
        )
        got = {
            r.id: (r.first_failed_idx, r.first_failed_rule)
            for r in first_failing_rule(df, _rules()).collect()
        }
        assert got == {
            1: (0, "min_words"),
            2: (3, None),
            3: (1, "lang_en"),
            4: (0, "min_words"),
            5: (2, "max_words"),
        }

    def test_validation(self, spark):
        df = _mk(spark, [(1, 1, "en")])
        with pytest.raises(ValueError):
            first_failing_rule(df, [])
        with pytest.raises(ValueError):
            first_failing_rule(
                df, [("a", F.lit(True)), ("a", F.lit(False))]
            )
        with pytest.raises(ValueError):
            first_failing_rule(df, [(KEPT, F.lit(True))])


class TestFunnel:
    def test_ledger_matches_sequential_filtering(self, spark):
        """The one-pass funnel equals literally filtering stage by
        stage, on random data."""
        rng = random.Random(3)
        rows = [
            (i, rng.randint(0, 100), rng.choice(["en", "fr", "de"]))
            for i in range(200)
        ]
        df = _mk(spark, rows)
        ledger = {
            r.rule_idx: (r.rule, r.n_in, r.n_dropped, r.n_out)
            for r in rule_funnel(df, _rules()).collect()
        }
        # sequential reference
        cur = rows
        preds = [
            lambda r: r[1] is not None and r[1] >= 20,
            lambda r: r[2] == "en",
            lambda r: r[1] is not None and r[1] <= 85,
        ]
        for i, ((name, _), p) in enumerate(zip(_rules(), preds)):
            n_in = len(cur)
            nxt = [r for r in cur if p(r)]
            assert ledger[i] == (name, n_in, n_in - len(nxt), len(nxt)), i
            cur = nxt

    def test_zero_drop_rules_still_reported(self, spark):
        df = _mk(spark, [(1, 50, "en"), (2, 60, "en")])
        out = {r.rule: r.n_dropped for r in rule_funnel(df, _rules()).collect()}
        assert out == {"min_words": 0, "lang_en": 0, "max_words": 0}

    def test_empty_input(self, spark):
        df = _mk(spark, []).where(F.lit(False))
        rows = rule_funnel(df, _rules()).orderBy("rule_idx").collect()
        assert [(r.n_in, r.n_dropped, r.n_out) for r in rows] == [(0, 0, 0)] * 3

    def test_survivors_identity(self, spark):
        """Last rule's n_out equals the count surviving every rule."""
        rng = random.Random(7)
        rows = [
            (i, rng.randint(0, 100), rng.choice(["en", "fr"]))
            for i in range(300)
        ]
        df = _mk(spark, rows)
        last = (
            rule_funnel(df, _rules())
            .orderBy(F.col("rule_idx").desc())
            .first()
        )
        survivors = df.where(
            (F.col("words") >= 20)
            & (F.col("lang") == "en")
            & (F.col("words") <= 85)
        ).count()
        assert last.n_out == survivors
