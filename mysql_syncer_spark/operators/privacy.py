"""Privacy / re-identification screening: k-anonymity and l-diversity
over quasi-identifiers, with generalization helpers to repair
violations.

The governance sibling of the PII scanner (operators/text.py): PII
finds DIRECT identifiers inside text; this module measures INDIRECT
re-identification risk — a row whose quasi-identifier combination
(nation × segment × age-band × ...) is shared by fewer than k rows is
linkable even with every direct identifier scrubbed. A release is
k-anonymous iff every occupied quasi-identifier cell has ≥ k rows.

Shapes: the audit is ONE combinable groupBy on the quasi columns
(cell-domain-sized output); generalization is row-local codegen
(floor-bucket numerics, truncate strings) — coarsening monotonically
merges cells, so repeated generalize → audit loops converge. Nothing
here shuffles more than the cell histogram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_cells(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Per-cell audit: every occupied quasi-identifier combination with
    its row count and a ``risky`` flag (count < k). NULL is a cell
    value like any other (NULL quasi values still partition rows)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("risky", F.col("n_rows") < k)
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """One-row release gate: ``(n_cells, n_risky_cells, rows_at_risk,
    min_cell_size, k_anonymous)`` — the number the privacy review
    asks for. Work = the cell histogram + one tiny agg."""
    cells = k_anonymity_cells(df, quasi_cols, k)
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("risky").cast("long")).alias("n_risky_cells"),
        F.coalesce(
            F.sum(F.when(F.col("risky"), F.col("n_rows"))), F.lit(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("n_rows").alias("min_cell_size"),
        (F.sum(F.col("risky").cast("long")) == 0).alias("k_anonymous"),
    )


def l_diversity_cells(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """Per-cell l-diversity audit: for every occupied quasi-identifier
    cell, the number of DISTINCT sensitive values it contains and a
    ``risky`` flag (diversity < l). The attack k-anonymity misses:
    a cell can hold >= k rows yet leak the sensitive attribute
    outright when every row in it shares one value (homogeneity
    attack) — l-diversity requires >= l distinct sensitive values per
    cell. NULL sensitive values are excluded from the diversity count
    (an absent attribute discloses nothing); NULL quasi values still
    partition rows, as in :func:`k_anonymity_cells`. ONE combinable
    groupBy (count-distinct over the cell domain), cell-sized output."""
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive_col {sensitive_col!r} cannot be a quasi column"
        )
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sensitive_col).alias("diversity"),
        )
        .withColumn("risky", F.col("diversity") < l)
    )


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """One-row release gate for l-diversity: ``(n_cells, n_risky_cells,
    rows_at_risk, min_diversity, l_diverse)`` — the homogeneity-attack
    companion to :func:`k_anonymity_report`. Work = the cell histogram
    + one tiny agg."""
    cells = l_diversity_cells(df, quasi_cols, sensitive_col, l)
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("risky").cast("long")).alias("n_risky_cells"),
        F.coalesce(
            F.sum(F.when(F.col("risky"), F.col("n_rows"))), F.lit(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("diversity").alias("min_diversity"),
        (F.sum(F.col("risky").cast("long")) == 0).alias("l_diverse"),
    )


def generalize_numeric(col: Column | str, width: int) -> Column:
    """Coarsen a numeric quasi-identifier to its ``width``-sized band
    lower bound (floor-bucket) — the standard generalization step;
    widening ``width`` monotonically merges cells."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * width).cast("long")


def generalize_prefix(col: Column | str, length: int) -> Column:
    """Coarsen a string quasi-identifier to its first ``length``
    characters (zip → zip3 style)."""
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, length)
