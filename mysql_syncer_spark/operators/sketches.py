"""Mergeable sketch rollups: distinct counts over ANY time window
without rescanning events — the measure plain rollup maintenance
can't fold.

operators/incremental_agg.py maintains count/sum/min/max because they
are monoids; COUNT DISTINCT is not (two days' distinct counts don't
add). The industry answer is to store the STATE, not the number:
Apache DataSketches HLL sketches are fixed-size (~KBs), mergeable
binary aggregates — keep one sketch per (grain, key) and any
window/rollup query is a union of sketches, never a base rescan.
Spark ships the agg/union/estimate functions natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
JVM-side, map-combinable); this module shapes them into the
daily-rollup workflow:

* ``hll_rollup``          — one pass over the grain: (grain cols,
  sketch) rows, the persisted state table;
* ``hll_rollup_merge``    — fold a new batch's rollup into the stored
  one (same full-outer merge discipline as incremental_agg; unions
  where both sides have state);
* ``hll_estimate_over``   — distinct estimate for any grouping of the
  stored grains: union the sketches per output group, estimate once.

Estimates are approximate (~1-2% at the default lgK); there is no SQL
oracle form — the pytest gates assert tolerance against exact
distincts and, critically, that merged-state estimates EQUAL the
estimate of the directly-computed union (merge loses nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    grain: list[str],
    value_col: str,
    sketch_col: str = "sketch",
    lgk: int = 12,
) -> DataFrame:
    """One map-combinable pass: ``(grain..., sketch)`` — the state table
    a daily job appends/merges into. lgK 12 ≈ 1.6 KB per sketch,
    ~1.6% relative standard error."""
    return df.groupBy(*grain).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(sketch_col)
    )


def hll_rollup_merge(
    stored: DataFrame,
    batch: DataFrame,
    grain: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Fold a batch rollup into the stored rollup per grain: union where
    both have state, pass-through otherwise — delta-sized work plus a
    grains-sized merge, the base data never rescanned."""
    a = stored.select(*grain, F.col(sketch_col).alias("__a"))
    b = batch.select(*grain, F.col(sketch_col).alias("__b"))
    return a.join(b, on=grain, how="full_outer").select(
        *grain,
        F.when(F.col("__a").isNull(), F.col("__b"))
        .when(F.col("__b").isNull(), F.col("__a"))
        .otherwise(F.hll_union("__a", "__b"))
        .alias(sketch_col),
    )


def hll_estimate_over(
    rollup: DataFrame,
    group_by: list[str],
    sketch_col: str = "sketch",
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Distinct estimate for any coarser grouping of the stored grain
    (``group_by=[]`` = grand total): union the per-grain sketches into
    each output group, estimate once. Sketch-count-sized work."""
    grouped = (
        rollup.groupBy(*group_by)
        if group_by
        else rollup.groupBy(F.lit(1).alias("__all"))
    )
    out = grouped.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).alias(out_col)
    )
    return out.drop("__all") if not group_by else out
