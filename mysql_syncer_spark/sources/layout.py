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


def _list_files(spark: SparkSession, path: str):
    """(n_files, total_bytes) of the data files under ``path`` via the
    Hadoop FileSystem API — correct on HDFS/S3, not just local disk.
    Hidden files (_SUCCESS, .crc, staging dirs) excluded."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n, total = 0, 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    partition_cols: Sequence[str] | str | None = None,
    fmt: str = "parquet",
) -> dict:
    """Rewrite a table directory into ~``target_mb``-sized files — the
    small-file maintenance pass every long-lived 100 TB layout needs.

    Incremental jobs (streaming micro-batches, per-partition syncs,
    index appends) each emit files sized by THEIR batch, and after
    thousands of runs the directory holds millions of KB-scale files
    that crush scan planning (one FileScan task per file) and the
    namenode/object-store listing. This op rewrites the data at the
    layout it should have had: file count = ceil(bytes / target_mb).

    * flat layout — one ``repartition(n)`` (row-hash balanced);
    * partitioned layout (``partition_cols``) — ``repartition(n,
      cols)`` so each directory's rows co-locate in few tasks, written
      back through ``partitionBy`` (directory structure preserved, so
      PartitionFilters pruning still works).

    The rewrite stages to ``<path>.__compacting__`` then swaps with
    Hadoop FS renames only — old dir aside to ``<path>.__old__``,
    staging into place, old dir deleted last — never overwriting the
    input it is lazily reading. Readers therefore see the old layout or
    the new one; the path is absent only for the instant between the
    two renames, and a crash anywhere leaves a recoverable state (the
    data is always intact under exactly one of path/__old__/
    __compacting__; stale leftovers are cleaned on the next run).

    At 100 TB this runs per-partition (pass the partition root as
    ``path``) or as a scheduled whole-table pass; either way the data
    is restated exactly once.
    """
    if target_mb < 1:
        raise ValueError(f"target_mb must be >= 1, got {target_mb}")
    staging = path.rstrip("/") + ".__compacting__"
    old = path.rstrip("/") + ".__old__"
    jstaging = spark._jvm.org.apache.hadoop.fs.Path(staging)
    jold = spark._jvm.org.apache.hadoop.fs.Path(old)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jstaging):  # crashed previous attempt mid-write
        fs.delete(jstaging, True)
    if fs.exists(jold):  # crashed previous attempt mid-swap
        if not fs.exists(jpath):
            fs.rename(jold, jpath)  # recover: old data back in place
        else:
            fs.delete(jold, True)

    n_before, total_bytes = _list_files(spark, path)
    n_target = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)

    if partition_cols:
        cols = (
            [partition_cols]
            if isinstance(partition_cols, str)
            else list(partition_cols)
        )
        out = df.repartition(int(n_target), *cols)
        out.write.format(fmt).mode("overwrite").partitionBy(*cols).save(
            staging
        )
    else:
        out = df.repartition(int(n_target))
        out.write.format(fmt).mode("overwrite").save(staging)

    # swap via renames (no delete-then-rename window where the path
    # holds the ONLY copy in staging): aside -> in place -> drop old
    fs.rename(jpath, jold)
    fs.rename(jstaging, jpath)
    fs.delete(jold, True)
    n_after, _ = _list_files(spark, path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes": total_bytes,
    }


def _zvalue(cols: Sequence, bits: int = 16):
    """Morton (Z-order) interleave of pre-bucketed non-negative int
    columns — pure codegen bit arithmetic, no UDF. For n columns of
    ``bits`` bits each the result has n*bits bits (n*bits <= 63)."""
    from functools import reduce

    from pyspark.sql import functions as F

    n = len(cols)
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
    target_rows_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered on the Z-order (Morton) curve of
    ``zorder_cols`` — multi-column data skipping for columns that can't
    all be directory partitions.

    Parquet scans prune ROW GROUPS whose column min/max excludes the
    pushed filter. A plain layout interleaves all values everywhere, so
    every row group spans the full range of every column and nothing
    skips. Sorting by ONE column fixes skipping for it and ruins the
    others; the Z-curve interleaves the bits of ALL the cluster columns
    so nearby z-values are nearby in EVERY dimension — each row group
    covers a narrow slice of each column, and a filter on ANY of them
    prunes most groups (the same trick Delta/Iceberg OPTIMIZE ZORDER
    applies, rebuilt here with plain codegen bit math).

    Each column is min-max scaled to ``bits`` bits in-plan (one tiny
    agg crossJoined broadcast — no driver collect), Morton-interleaved,
    then ``repartitionByRange`` + ``sortWithinPartitions`` on the
    z-value: ONE range shuffle total, files and row groups inherit the
    locality. NULLs scale to bucket 0.
    """
    from pyspark.sql import functions as F

    cols = list(zorder_cols)
    if not cols:
        raise ValueError("zorder_cols must be non-empty")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds the 63-bit z-value"
        )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
    bounds = df.agg(*aggs)
    top = (1 << bits) - 1
    scaled = df.crossJoin(F.broadcast(bounds))
    keys = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        frac = (F.col(c).cast("double") - mn) / span
        keys.append(
            F.coalesce(
                F.least(
                    F.floor(frac * top).cast("long"), F.lit(top)
                ),
                F.lit(0),
            )
        )
    z = scaled.withColumn("__z", _zvalue(keys, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
    if num_files is not None:
        out = z.repartitionByRange(num_files, "__z")
    else:
        out = z.repartitionByRange("__z")
    out = out.sortWithinPartitions("__z").drop("__z")
    writer = out.write.format(fmt).mode("overwrite")
    if target_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", target_rows_per_file)
    writer.save(path)
