"""Partitioned + sized output layout: the write-side half of pruning.

Two layout levers the engine applies when materializing tables:

* **Hive-style partition directories** (``partitionBy``): a filter on
  the partition column becomes a *PartitionFilters* entry in the scan —
  Spark never opens the non-matching directories. The reference syncs
  very large tables partition-by-partition for exactly this reason
  (Synchronizer.php:130-190, SyncTablePartition.php); writing the
  partition column into the directory layout makes every later
  per-partition diff read only its own slice.
* **File sizing** (``target_rows_per_file``): shuffle-heavy stages at
  100 TB otherwise emit one file per reduce task — 200k tiny files that
  crush the driver's file index and the namenode. ``repartitionByRange``
  on the partition column packs rows for the same directory together
  and bounds file count; ``maxRecordsPerFile`` caps the other extreme.

Partition columns must be low-cardinality (dates, regions, status
codes): one directory per value. High-cardinality pruning belongs to
bucketing (sources/bucketed.py) or min/max row-group stats instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from mysql_syncer_spark.sources.bucketed import physical_plan


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] | str,
    target_rows_per_file: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` under ``path`` as ``col=value/`` directories."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(
        partition_cols
    )
    out = df.repartitionByRange(*cols)
    writer = out.write.format(fmt).mode(mode).partitionBy(*cols)
    if target_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", target_rows_per_file)
    writer.save(path)


def read_pruned(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a partitioned layout; filters on partition columns prune at
    planning time (assert with :func:`assert_partition_pruned`)."""
    return spark.read.format(fmt).load(path)


def assert_partition_pruned(df: DataFrame, col: str) -> None:
    """Raise unless the plan prunes partition directories on ``col`` —
    i.e. the scan's PartitionFilters mention it. The inverse gate of
    ``assert_no_shuffle``: this one proves the READ side never touches
    the other directories."""
    plan = physical_plan(df)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    if not m or col not in m.group(1):
        raise AssertionError(
            f"scan does not partition-prune on {col!r}:\n{plan}"
        )
