"""Privacy / re-identification screening: k-anonymity over
quasi-identifiers, with generalization helpers to repair violations.

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
