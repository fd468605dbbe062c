"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The reference re-reads and re-hashes both databases on every sync run
(Synchronizer.php:193-230 — nothing is ever pre-organized). At 100 TB
the dominant recurring cost of the diff kernels is the shuffle of both
sides onto the PK. Spark's answer is bucketing: write each table hashed
into N buckets on its join key ONCE (``bucketBy`` + ``saveAsTable``);
every later join/groupBy on that key reads both sides already
co-partitioned — SortMergeJoin with ZERO Exchange on either side, at
any scale. This turns the nightly-sync economics from
"shuffle everything, every night" into "shuffle once at layout time".

Notes for real deployments:
* both sides must bucket on the join key with the SAME bucket count
  (or a divisor — Spark 3.1+ coalesces mismatched buckets);
* buckets also pre-organize groupBy(pk) aggregations (hash maps,
  digests) — the exchange before the partial agg disappears;
* ``sortBy`` inside buckets removes the in-stage sort of the
  SortMergeJoin as well.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed catalog table (bucketing metadata
    only exists through the catalog — a bare path write can't carry it).
    """
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols if sort_cols else bucket_cols))
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. When both
    sides are bucketed on ``on`` with compatible bucket counts, the
    physical plan contains no Exchange — verify with
    ``assert_no_shuffle`` (tests do)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan as a string (for plan assertions)."""
    spark = df.sparkSession
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the plan contains any Exchange (shuffle or broadcast)."""
    plan = physical_plan(df)
    if "Exchange" in plan:
        raise AssertionError(f"plan contains an Exchange:\n{plan}")


def ensure_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Return ``table`` as a bucketed catalog table, laying it out from
    ``df`` on first touch in this session. The in-memory catalog's
    metadata dies with the session but its files don't, so a fresh
    session ALWAYS rewrites (after purging the orphaned managed
    location — the minhash-index discipline): a stale on-disk layout
    can never silently serve different data. Within a session the
    write happens once; every later call is a pure catalog read."""
    from mysql_syncer_spark.operators.minhash_index import _drop_stale

    if not spark.catalog.tableExists(table):
        _drop_stale(spark, table)
        write_bucketed(
            df, table, bucket_cols, num_buckets=num_buckets,
            sort_cols=sort_cols,
        )
    return spark.table(table)
