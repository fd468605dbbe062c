"""Statistical analytics: correlation matrices and per-group linear
trends — the exploratory-stats layer (feature redundancy screens,
metric co-movement dashboards, drift slopes) over series the engine
already materializes.

Everything here is CLOSED-FORM COMBINABLE aggregation — Pearson's r
and OLS slope/intercept/R² are all functions of the monoid sums (n,
Σx, Σy, Σxy, Σx², Σy²), which Spark exposes directly as map-side-
combinable aggregates (``corr``, ``regr_slope``, ``regr_intercept``,
``regr_r2``). One shuffle per query, K²-sized outputs, no iteration:
the correct at-scale shape for any series count K ≪ rows.

Cross-engine note: the sums accumulate in different orders on the two
engines, so final doubles differ in the last ulps — surfaced values
round to 6 decimals (the repo's standing float discipline).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_matrix(
    df: DataFrame, value_cols: list[str], min_rows: int = 2
) -> DataFrame:
    """Pearson correlation for every unordered pair of ``value_cols``
    in ONE aggregation pass: ``(col_a, col_b, corr, n)`` with
    col_a < col_b. ``n`` counts rows where BOTH columns are non-NULL
    (the pairwise-complete convention; ``corr`` ignores NULL pairs the
    same way). Pairs observed on fewer than ``min_rows`` complete rows
    return NULL corr (undefined), not a number."""
    if len(value_cols) < 2:
        raise ValueError("need at least two value columns")
    aggs = []
    for a, b in combinations(value_cols, 2):
        aggs.append(F.corr(a, b).alias(f"__c_{a}_{b}"))
        aggs.append(
            F.count(
                F.when(
                    F.col(a).isNotNull() & F.col(b).isNotNull(), F.lit(1)
                )
            ).alias(f"__n_{a}_{b}")
        )
    row = df.agg(*aggs)
    pairs = None
    for a, b in combinations(value_cols, 2):
        cell = row.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.when(
                F.col(f"__n_{a}_{b}") >= min_rows, F.col(f"__c_{a}_{b}")
            ).alias("corr"),
            F.col(f"__n_{a}_{b}").alias("n"),
        )
        pairs = cell if pairs is None else pairs.unionByName(cell)
    return pairs


def group_trends(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS trend of ``y_col`` against ``x_col``:
    ``(group..., slope, intercept, r2, n)`` via the closed-form
    regression aggregates — one combinable shuffle on the group key,
    the drift-slope monitor for any metric series. Groups whose x has
    zero variance return NULL slope (vertical fit is undefined)."""
    pair_ok = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    return df.groupBy(*group_cols).agg(
        F.regr_slope(y_col, x_col).alias("slope"),
        F.regr_intercept(y_col, x_col).alias("intercept"),
        F.regr_r2(y_col, x_col).alias("r2"),
        F.count(F.when(pair_ok, F.lit(1))).alias("n"),
    )
