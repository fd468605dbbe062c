"""Skew mitigation: salted join ≡ plain join, per-how, plus the
hot-key diagnostic."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.skew import salted_join, top_frequent_keys


@pytest.fixture(scope="module")
def skewed(spark):
    # power-law: key 1 holds 80% of rows — the shape that melts a reducer
    rows = [(i, 1 if i % 5 != 0 else i % 50) for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, k long")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name_{k}") for k in range(0, 50, 2)], "k long, name string"
    )


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_equals_plain(skewed, dim, how):
    plain = skewed.join(dim, on="k", how=how)
    salted = salted_join(skewed, dim, on="k", n_salts=7, how=how)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(skewed, dim):
    # the hot key's rows land in n_salts distinct salt groups
    from mysql_syncer_spark.operators.skew import SALT_COL

    n = (
        skewed.withColumn(
            SALT_COL,
            F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(7)),
        )
        .where(F.col("k") == 1)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert n == 7


def test_salted_join_rejects_unsafe_how(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, on="k", how="full")
    with pytest.raises(ValueError):
        salted_join(skewed, dim, on="k", n_salts=0)


def test_top_frequent_keys(skewed):
    top = top_frequent_keys(skewed, "k", n=3).collect()
    assert top[0]["key"] == 1 and top[0]["cnt"] == 800
    assert top[0]["cnt"] > top[1]["cnt"]
