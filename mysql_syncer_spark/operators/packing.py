"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "concat-then-chunk" pretraining batch layout).

A training pipeline doesn't feed documents to the model one-by-one; it
packs them into contiguous sequences of ~context-window tokens. Doing
that as a single global greedy scan is inherently serial, so the
distributed form used here (and by real pipelines) is:

1. hash every doc into one of ``n_buckets`` independent packing groups
   (deterministic md5 bucket — reproducible across runs/engines, and
   uniform, so group sizes are balanced at any scale);
2. within a group, order docs deterministically (by id), take a running
   token cumsum, and chunk by the doc's *starting offset*:
   ``seq = start_offset // budget``. A doc that straddles a boundary
   belongs to the sequence where it starts — each sequence carries
   budget ± max_doc_tokens, the standard best-effort packing contract.

One shuffle total (the window partition on the group key). At 100 TB
the degree of parallelism is ``n_buckets`` — size it ~total_tokens /
(budget × target_seqs_per_task); the per-group state is a running sum,
never a collected list. Every step is window/codegen SQL with an exact
DuckDB mirror (same md5 bucket, same cumsum, same integer division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.sampling import hash_bucket

#: seq_id = bucket * _SEQ_STRIDE + seq_in_bucket — collision-free while
#: a single bucket packs < 2^40 sequences (≈10^12; at budget 2048 that
#: is ~2×10^15 tokens per bucket before overflow).
_SEQ_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 32,
    salt: str = "",
) -> DataFrame:
    """Add ``(pack_bucket, seq_id, seq_offset)`` to every document.

    ``seq_id`` is globally unique (bucket-strided); ``seq_offset`` is
    the doc's token offset inside its sequence. Deterministic under any
    input partitioning/order; ``salt`` decorrelates independent
    packings over the same corpus.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bucket = F.pmod(hash_bucket(id_col, salt), F.lit(n_buckets))
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    return (
        df.withColumn("pack_bucket", bucket)
        .withColumn("__start", start)
        .withColumn(
            "seq_id",
            # `div`: exact integral division (floor() of a double
            # quotient loses bits once offsets exceed 2^53)
            F.col("pack_bucket") * F.lit(_SEQ_STRIDE)
            + F.expr(f"__start div {budget}"),
        )
        .withColumn("seq_offset", F.pmod("__start", F.lit(budget)))
        .drop("__start")
    )


def pack_oracle_sql(
    inner: str,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 32,
    salt: str = "",
) -> str:
    """DuckDB mirror of :func:`pack_sequences` over ``inner`` (a
    subquery/CTE yielding at least ``id_col`` and ``tokens_col``)."""
    from mysql_syncer_spark.operators.sampling import duckdb_hash_bucket_sql

    bucket = f"({duckdb_hash_bucket_sql(id_col, salt)}) % {n_buckets}"
    return (
        f"SELECT {id_col}, pack_bucket, "
        f"CAST(pack_bucket * {_SEQ_STRIDE} + st // {budget} AS BIGINT)"
        f" AS seq_id, "
        f"CAST(st % {budget} AS BIGINT) AS seq_offset "
        f"FROM (SELECT {id_col}, pack_bucket, "
        f"SUM({tokens_col}) OVER (PARTITION BY pack_bucket ORDER BY "
        f"{id_col} ROWS UNBOUNDED PRECEDING) - {tokens_col} AS st "
        f"FROM (SELECT {id_col}, {tokens_col}, CAST({bucket} AS BIGINT)"
        f" AS pack_bucket FROM ({inner})))"
    )
