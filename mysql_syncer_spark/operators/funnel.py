"""Ordered-funnel analysis: how far does each key progress through a
required event sequence?

The classic product-analytics question (view → click → purchase): for
every key, the earliest timestamp at which it completed step i GIVEN
it completed step i-1 earlier — not merely "did both events happen",
the ORDER is the semantics. SQL engines grew MATCH_RECOGNIZE for this;
Spark has no native operator, but the earliest-completion funnel
decomposes into a cascade of conditional min-aggregations:

    t_0 = min ts of step-0 events
    t_i = min ts of step-i events with ts > t_{i-1}

Each stage is one filtered aggregation over ONLY that step's events
(a fraction of the stream — the filter pushes to the scan) joined to
the per-key stage table. N steps = N combinable shuffles on the key
domain; nothing quadratic, no window over the full stream, no state
larger than one row per key. At 100 TB the step filters prune the
scan (event_type is the partition/cluster key of any sane event
store), and AQE broadcasts the stage table while funnels are narrow.

The cascade computes the *greedy earliest* chain. Greedy-earliest is
the standard funnel definition and is complete for it: if ANY ordered
chain of the steps exists, the greedy one exists (each greedy prefix
timestamp is minimal, so a later valid continuation remains valid).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    out_prefix: str = "t",
) -> DataFrame:
    """Per ``key_col``: ``{out_prefix}{i}`` = earliest completion time
    of step i (NULL once the chain breaks), plus ``n_steps`` = how many
    consecutive steps completed. Keys that never did step 0 are absent
    (they are the "didn't enter the funnel" cohort)."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    stage = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias(f"{out_prefix}0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = df.where(F.col(type_col) == step).select(
            key_col, F.col(ts_col).alias("__ts")
        )
        prev = f"{out_prefix}{i - 1}"
        carried = [f"{out_prefix}{j}" for j in range(i)]
        stage = (
            stage.join(nxt, on=key_col, how="left")
            .groupBy(key_col)
            .agg(
                # prior stage times are constant per key: min re-picks them
                *[F.min(c).alias(c) for c in carried],
                F.min(
                    F.when(F.col("__ts") > F.col(prev), F.col("__ts"))
                ).alias(f"{out_prefix}{i}"),
            )
        )
    n = F.lit(0)
    for i in range(len(steps)):
        n = n + F.col(f"{out_prefix}{i}").isNotNull().cast("int")
    return stage.withColumn("n_steps", n)


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    unit: str = "week",
) -> DataFrame:
    """Cohort retention triangle: ``(cohort, offset, n_active)`` where
    cohort = the key's first-activity period (``date_trunc(unit)``),
    offset = whole periods since the cohort period, and n_active = how
    many of that cohort's keys were active in that offset period — the
    other classic product-analytics query next to the funnel.

    Shape: first-activity = one combinable min-agg on the key; activity
    grid = distinct (key, period) — one combinable shuffle; cohort map
    joined back on the key (AQE broadcasts it when cohorts are narrow);
    final count-distinct collapses to (cohort, offset) cells, a
    triangle of at most periods² rows. Nothing scales with raw event
    count past the first distinct."""
    if unit not in ("day", "week", "month"):
        raise ValueError(f"unit must be day/week/month, got {unit}")
    per_len = {"day": 1, "week": 7}.get(unit)
    period = F.date_trunc(unit, F.col(ts_col))
    activity = df.select(
        F.col(key_col), period.cast("date").alias("__p")
    ).distinct()
    first = activity.groupBy(key_col).agg(F.min("__p").alias("__cohort"))
    joined = activity.join(first, on=key_col)
    if unit == "month":
        offset = (
            (F.year("__p") - F.year("__cohort")) * 12
            + (F.month("__p") - F.month("__cohort"))
        )
    else:
        offset = F.floor(F.datediff("__p", "__cohort") / per_len)
    return (
        joined.select(
            F.col("__cohort").alias("cohort"),
            offset.cast("int").alias("offset"),
            key_col,
        )
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(F.col(key_col)).alias("n_active"))
    )
