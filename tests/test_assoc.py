"""Association rules (operators/assoc.py): hand-computed metrics on a
known basket set, the mega-basket guard, dedup-within-basket
semantics, and validation."""

import pytest

from mysql_syncer_spark.operators.assoc import cooccurrence_rules

# 4 baskets: {A,B} {A,B} {A,C} {B} -> n(A)=3 n(B)=3 n(C)=1 n(A,B)=2
BASKETS = [
    (1, "A"), (1, "B"),
    (2, "A"), (2, "B"), (2, "B"),   # duplicate item collapses
    (3, "A"), (3, "C"),
    (4, "B"),
    (5, None), (None, "A"),          # NULLs excluded
]


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(BASKETS, "b long, i string")
    return {
        (r["antecedent"], r["consequent"]): r
        for r in cooccurrence_rules(df, "b", "i").collect()
    }


def test_hand_computed_metrics(rules):
    ab = rules[("A", "B")]
    assert (ab["n_pair"], ab["n_antecedent"], ab["n_consequent"],
            ab["n_baskets"]) == (2, 3, 3, 4)
    assert ab["support"] == pytest.approx(0.5)
    assert ab["confidence"] == pytest.approx(2 / 3)
    assert ab["lift"] == pytest.approx(2 * 4 / 9)
    # asymmetric confidence: C->A is certain, A->C is 1/3
    assert rules[("C", "A")]["confidence"] == pytest.approx(1.0)
    assert rules[("A", "C")]["confidence"] == pytest.approx(1 / 3)
    # both directions present for every pair
    assert set(rules) == {
        ("A", "B"), ("B", "A"), ("A", "C"), ("C", "A"),
    }


def test_mega_basket_guard(spark):
    rows = [(1, "A"), (1, "B")] + [(9, f"x{i}") for i in range(50)] + [
        (9, "A"), (9, "B")
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    capped = cooccurrence_rules(df, "b", "i", max_items=10).collect()
    # basket 9 (52 items) is excluded from the PAIR universe...
    assert {(r["antecedent"], r["consequent"]) for r in capped} == {
        ("A", "B"), ("B", "A")
    }
    ab = [r for r in capped if r["antecedent"] == "A"][0]
    assert ab["n_pair"] == 1
    # ...but not from item supports or the basket count
    assert ab["n_antecedent"] == 2 and ab["n_baskets"] == 2


def test_min_pair_count_threshold(spark):
    df = spark.createDataFrame(BASKETS, "b long, i string")
    out = cooccurrence_rules(df, "b", "i", min_pair_count=2).collect()
    assert {(r["antecedent"], r["consequent"]) for r in out} == {
        ("A", "B"), ("B", "A")
    }


def test_validation(spark):
    df = spark.createDataFrame(BASKETS, "b long, i string")
    with pytest.raises(ValueError, match="min_pair_count"):
        cooccurrence_rules(df, "b", "i", min_pair_count=0)
    with pytest.raises(ValueError, match="max_items"):
        cooccurrence_rules(df, "b", "i", max_items=1)
