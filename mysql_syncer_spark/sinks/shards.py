"""Training-shard export: deterministic, size-balanced parquet shards.

The last step of a curation pipeline is writing the corpus in the
layout a training job consumes: a fixed number of shards, each a
self-contained file set, with (a) DETERMINISTIC doc→shard assignment
(re-running the export after an incremental ingest moves no existing
doc between shards — only new docs land, so downstream caches and
resume points stay valid) and (b) a deterministic within-shard order
(byte-identical re-exports).

Shard assignment reuses the engine's md5-bucket hash
(operators/sampling.hash_bucket), so the mapping is engine-exact and
oracle-checkable; balance follows from the hash being uniform — at
n_shards ≪ BUCKETS the max/min shard skew is O(1/sqrt(docs_per_shard)).

Scale shape: the assignment is a row-local codegen expression; the
write is ``repartition(n_shards, shard)`` → ``partitionBy(shard)``, so
each shard is produced by exactly one task writing one file set —
no small-files explosion, no post-hoc compaction. For shards larger
than one task should write, ``max_records_per_file`` splits files
WITHIN the shard directory without changing the doc→shard mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.sampling import hash_bucket


def with_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
) -> DataFrame:
    """Add the deterministic shard id: ``md5-bucket(key) % n_shards``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        shard_col,
        F.pmod(hash_bucket(key_col, salt), F.lit(n_shards)).cast("int"),
    )


def shard_stats(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    size_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest: ``(shard, n_rows[, total_size])`` — the
    balance check run before committing an export, and the manifest a
    training job uses to plan reads. One map-side-combinable groupBy
    over n_shards keys."""
    sharded = with_shard(df, key_col, n_shards, salt)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col).cast("long")).alias("total_size"))
    return sharded.groupBy("shard").agg(*aggs)


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "",
    order_col: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``path/shard=K/*.parquet`` for K in
    [0, n_shards): deterministic assignment, one writer task per shard,
    rows ordered by ``order_col`` (default: the shard key) within each
    shard so re-exports are byte-stable."""
    sharded = with_shard(df, key_col, n_shards, salt)
    order = order_col if order_col is not None else key_col
    out = sharded.repartition(n_shards, "shard").sortWithinPartitions(order)
    writer = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read an exported shard set; ``shards`` selects a subset via
    partition pruning (a data-parallel trainer reads only its own
    shards — the scan never touches the rest)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df


def sorted_shard_assign(
    df: DataFrame,
    key_col: str,
    tiebreak_col: str,
    n_shards: int,
    shard_col: str = "shard",
) -> DataFrame:
    """E173: assign rows to shards in GLOBAL KEY ORDER — shard 1 holds
    the smallest keys, shard ``n`` the largest, equal-frequency — via
    the exact-NTILE decomposition (operators/profile.exact_ntile, the
    E171 bounded-window kernel), so no global sort window ever runs:
    the classic export shape for curriculum/length-bucketed training
    data where ``repartitionByRange`` would do sampling-dependent,
    run-to-run-unstable boundaries. Assignment is fully deterministic:
    the total order is ``(key, md5(tiebreak), tiebreak)``.

    NULL keys sort FIRST (Spark/SQL ascending default) and are routed
    to shard 1 — no row is ever dropped by the export."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from mysql_syncer_spark.operators.profile import exact_ntile

    nn = exact_ntile(
        df.where(F.col(key_col).isNotNull()),
        key_col,
        tiebreak_col,
        n_shards,
        out_col=shard_col,
    )
    nulls = df.where(F.col(key_col).isNull()).withColumn(
        shard_col, F.lit(1).cast("long")
    )
    return nn.unionByName(nulls)


def sorted_shard_manifest(
    df: DataFrame,
    key_col: str,
    tiebreak_col: str,
    n_shards: int,
) -> DataFrame:
    """Per-shard manifest of the SORTED export:
    ``(shard, n_rows, min_key, max_key)`` — adjacent shards' key ranges
    tile the domain (max_key of shard i <= min_key of shard i+1), which
    is what lets a reader do a binary search over shards by key, or a
    trainer consume the corpus in global order by walking shard 1..n.
    One groupBy over n_shards keys on top of the assignment."""
    assigned = sorted_shard_assign(df, key_col, tiebreak_col, n_shards)
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    )


def write_sorted_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    tiebreak_col: str,
    n_shards: int,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``path/shard=K/*.parquet`` in TOTAL GLOBAL KEY
    ORDER: shard directories ascend by key range and rows within each
    shard are sorted by the same deterministic total order the
    assignment used — reading shard 1..n front to back replays the
    whole corpus in sorted order, with no stage ever running a global
    sort window (the assignment is the E171 bounded-window NTILE; the
    within-shard sorts are embarrassingly parallel). Byte-stable across
    re-runs (hash tie-break, no sampling)."""
    assigned = sorted_shard_assign(df, key_col, tiebreak_col, n_shards)
    out = assigned.repartition(n_shards, "shard").sortWithinPartitions(
        F.col(key_col).asc_nulls_first(),
        F.md5(F.col(tiebreak_col).cast("string")),
        tiebreak_col,
    )
    writer = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
