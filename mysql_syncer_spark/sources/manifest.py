"""File-level min/max manifest: metadata-driven scan pruning for
columns that are neither directory partitions nor bucket keys.

Iceberg/Delta keep per-file column ranges in their metadata layer and
plan scans against THAT instead of listing+opening every file. Plain
parquet directories get row-group pruning only AFTER a file is opened
— at 100 TB with millions of files, opening footers IS the bottleneck.
This module rebuilds the metadata layer with the engine's own
primitives:

* ``build_manifest`` — one distributed pass: group by
  ``input_file_name()``, min/max/count per tracked column. Output is
  files-sized (KBs per thousand files), written as a plain parquet
  table next to the data.
* ``pruned_read`` — filter the manifest by range intersection
  (manifest-sized driver work), then read ONLY the surviving files.
  Composes multiplicatively with the Z-order layout
  (sources/layout.py): clustering makes per-file ranges narrow, the
  manifest turns narrow ranges into skipped files.

The manifest is advisory metadata, maintained like any derived table:
rebuild after rewrites (compaction, z-ordering), or fold in new files
incrementally — ``build_manifest`` on just the new files unioned onto
the stored table (operators/incremental_agg.py economics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(
    spark: SparkSession,
    path: str,
    cols: list[str],
    fmt: str = "parquet",
) -> DataFrame:
    """Per-file stats: ``(file, n_rows, <c>_min, <c>_max ...)`` in ONE
    distributed pass over the table (map-side-combinable agg keyed by
    the file name — at most one shuffle row per file)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    df = spark.read.format(fmt).load(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(
        F.input_file_name().alias("file")
    ).agg(*aggs)


def manifest_path(path: str) -> str:
    return path.rstrip("/") + ".__manifest__"


def write_manifest(
    spark: SparkSession, path: str, cols: list[str], fmt: str = "parquet"
) -> None:
    """Build and persist the manifest beside the table (coalesced to
    one file — it is files-sized metadata, not data)."""
    build_manifest(spark, path, cols, fmt).coalesce(1).write.mode(
        "overwrite"
    ).parquet(manifest_path(path))


def pruned_read(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    fmt: str = "parquet",
) -> tuple[DataFrame, int, int]:
    """Read only the files whose ``[col_min, col_max]`` range intersects
    ``[lo, hi]``; returns ``(df, files_read, files_total)``. The
    returned frame still needs the exact row filter (file ranges are a
    superset test) — apply ``.where`` as usual; this just spares the
    scan from opening the other files' footers at all. NULL-stat files
    (all-NULL column) are kept conservatively."""
    man = spark.read.parquet(manifest_path(path))
    total = man.count()
    keep = man.where(
        (F.col(f"{col}_max").isNull())
        | ((F.col(f"{col}_max") >= F.lit(lo)) & (F.col(f"{col}_min") <= F.lit(hi)))
    )
    files = [r["file"] for r in keep.select("file").collect()]
    if not files:
        empty = spark.read.format(fmt).load(path).limit(0)
        return empty, 0, total
    return spark.read.format(fmt).load(files), len(files), total
