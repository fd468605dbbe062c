"""Single-pass table profiling: per-column quality stats for triage.

Before a 100 TB corpus goes anywhere near training, someone asks "how
null is this column, how many distinct values, what's the range?" —
the data-quality audit the reference performs implicitly by diffing
everything (Synchronizer.php:193-230) and re-running until converged.
This operator answers it directly, in ONE scan:

* all columns' aggregates go into a single ``agg`` (count, nulls,
  exact distinct, min, max per column) — Spark plans the multi-distinct
  via one Expand + one combinable shuffle, so the table is read once no
  matter how many columns are profiled;
* the single wide row is unpivoted driver-side into the long
  ``(column, ...)`` shape — C rows of metadata, never data;
* min/max are stringified with a deterministic per-type rule
  (floats/doubles round to 6 dp through decimal, so the same values
  print identically on any engine — the rule the DuckDB oracle
  mirrors digit for digit).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stringify(col: Column, dtype: T.DataType) -> Column:
    """Deterministic cross-engine rendering of a min/max value."""
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        # fixed scale via decimal: '123.450000' on every engine — a raw
        # double→string cast is shortest-roundtrip and engine-dependent
        return F.round(col, 6).cast("decimal(28,6)").cast("string")
    return col.cast("string")


def profile_table(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Profile ``cols`` (default: all non-complex columns) into
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)`` —
    one row per column, one scan total. ``n_distinct`` is exact and
    excludes NULL (SQL COUNT(DISTINCT) semantics)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            n for n, t in fields.items()
            if not isinstance(t, (T.ArrayType, T.MapType, T.StructType,
                                  T.BinaryType))
        ]
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__nn_{c}"),  # non-null count
            F.countDistinct(col).alias(f"__nd_{c}"),
            _stringify(F.min(col), fields[c]).alias(f"__mn_{c}"),
            _stringify(F.max(col), fields[c]).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single wide row with stack() — pure projection, the
    # scan/shuffle above is the only data movement
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) as "
        "(column, __nn, n_distinct, min_value, max_value)",
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )
