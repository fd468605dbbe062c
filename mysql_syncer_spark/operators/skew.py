"""Skew mitigation: salted joins + hot-key diagnostics.

At 100 TB, an equi-join or aggregation with a power-law key (user_id,
domain, dedup-cluster label) funnels the hottest key's rows into a
single reducer — the partition that runs for hours while 999 executors
idle. Spark's AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``)
splits oversized *sort-merge* partitions at runtime and is the first
line of defense; explicit salting remains the portable fallback for
shapes AQE doesn't cover (aggregation skew, skewed broadcast-ineligible
joins under static planning, and any plan where the skew is known ahead
of time and re-planning mid-query is unwanted).

Reference provenance: the reference's analogue is its partition-wise
sync (Synchronizer.php:130-190) — manually splitting one huge table by
a partition column so no single unit dominates; salting is the same
idea applied to a join/group key instead of a table.

Mechanics of :func:`salted_join`: the big (skewed) side gets a
deterministic per-row salt in ``[0, n_salts)`` derived from hashing the
whole row; the small side is exploded ``n_salts``-fold so every
(key, salt) combination exists. The join key becomes (key, salt), so
one hot key's rows spread over ``n_salts`` reducers. Cost: the small
side is shuffled ``n_salts`` times larger — pick ``n_salts`` ≈ the
skew factor you need to flatten, not more. Results are bit-identical
to the unsalted join (oracle-checked in queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def top_frequent_keys(df: DataFrame, key_col: str, n: int = 20) -> DataFrame:
    """The skew diagnostic: the ``n`` most frequent keys with counts —
    run this (on a sample at scale) before choosing ``n_salts``.
    ``(key, cnt)`` ordered by cnt desc, key asc for determinism."""
    return (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to skew in ``big``'s join key: salt the big
    side per-row, explode the small side per-salt, join on key+salt.

    Supported ``how``: inner / left / left_semi / left_anti (the shapes
    where duplicating the small side cannot duplicate or drop results).
    The salt is deterministic (xxhash64 of the full row), so plans are
    reproducible run-to-run and across retries of a failed task.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn(SALT_COL, salt)
    small_s = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return big_s.join(small_s, on=keys + [SALT_COL], how=how).drop(SALT_COL)
