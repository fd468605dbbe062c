"""Scale-adaptive input spreading for compute-heavy map stages.

The cost model problem this solves (guide §2.5/§2.6): an operator whose
expensive work happens BEFORE its first exchange (per-row hashing,
k-gram explodes, regex scoring, vector math under a broadcast join)
inherits the SCAN's partitioning. A small input — one sub-row-group
parquet file — scans as ONE task, so the whole map stage runs on one
core while the rest of the cluster idles. At 100 TB the scan is wide
and there is nothing to fix; the fix must therefore be gated, not
unconditional.

``spread_small`` repartitions round-robin to the session parallelism
ONLY when the optimizer's size estimate says the scan cannot fill the
cluster (< cores × 128 MB ≈ the default maxPartitionBytes per task).
Above the gate the input passes through untouched — zero extra
exchange at scale. The gate reads the OPTIMIZED logical plan's
statistics (driver-side metadata, no job).

Round-robin repartition keeps Spark's sort-before-repartition
determinism (SPARK-23207); results of every caller are
partitioning-independent (aggregations, joins, windows with explicit
orderings), so spreading never changes values, only placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: per-task input target the gate assumes (the default
#: spark.sql.files.maxPartitionBytes): inputs above cores × this are
#: presumed to scan wide already
_TARGET_PARTITION_BYTES = 128 << 20


def _is_small(df: DataFrame) -> bool:
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return size < p * _TARGET_PARTITION_BYTES
    except Exception:
        return False


def spread_small(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's parallelism when
    (and only when) its estimated size is too small to fill the
    cluster from the scan alone. See module docstring."""
    if not _is_small(df):
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def pin_small(df: DataFrame) -> DataFrame:
    """Spread AND materialize ``df`` (``localCheckpoint``) when its
    estimated size is below the :func:`spread_small` gate; pass-through
    untouched above it.

    For operators whose multiply-consumed subtree is INPUT-sized (e.g.
    a tokenized corpus feeding a frequency pass, a flag pass and a
    rebuild pass): below the gate, materializing costs ~nothing and
    removes N-1 re-executions of the subtree; at 100 TB the pin would
    itself be a full-corpus write, so the operator falls back to
    recomputation — a deployment that wants the intermediate persisted
    does so explicitly (bucketed layout / checkpoint dir), a policy
    decision this helper must not hard-code.

    Only for subtrees whose downstream consumers are placement- and
    order-insensitive (joins, aggregations, windows with explicit
    orderings) — the same contract as :func:`spread_small`. The
    materialization mechanism follows the session's
    ``mysql_syncer_spark.pin_mode`` (see :mod:`mysql_syncer_spark.pin`)."""
    from mysql_syncer_spark.pin import pin

    if not _is_small(df):
        return df
    return pin(
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
