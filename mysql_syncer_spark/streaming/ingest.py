"""Streaming corpus-ingest gate: continuous curation of arriving
documents against a growing deduplicated corpus.

The batch operator :func:`~mysql_syncer_spark.operators.dedup.
incremental_new_docs` answers "which of these new docs are novel vs the
corpus?" — this module runs that gate CONTINUOUSLY: a document stream is
drained in micro-batches (foreachBatch), each batch is deduplicated
within itself (exact fingerprint + MinHash-LSH self-pairs), then gated
against the static corpus PLUS everything previously accepted, and the
survivors are appended to the accepted store. Later batches therefore
dedup against earlier batches — the accepted store *is* the growing
corpus extension.

Exactly-once on replay: each batch writes to its own
``batch_id=<n>`` subdirectory with mode=overwrite, so a micro-batch
replayed after a crash overwrites its own output instead of
double-appending (the standard idempotent-foreachBatch pattern; the
subdir doubles as provenance of WHEN a doc was accepted).

Scale notes: the per-batch work is corpus×batch bucket joins (bipartite
LSH), never corpus×corpus; the exact-fingerprint layer joins the batch
against a fingerprint projection of the corpus (broadcast-able once the
batch side is the small side). At 100 TB the corpus fingerprint/bucket
tables would be materialized once and incrementally maintained instead
of recomputed per batch — the operators already take DataFrames, so
swapping a precomputed signature table in is a call-site change.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.dedup import (
    incremental_new_docs,
    minhash_lsh_pairs,
)
from mysql_syncer_spark.operators.text import normalized_text


def dedup_batch_within(
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Within-batch dedup: keep the min-id representative of every
    exact-fingerprint group, then drop the larger id of every
    MinHash-LSH near-dup pair (greedy keep-first — a transitive chain
    keeps its minimum; micro-batches are small enough that the
    pair list is, too)."""
    w_ids = (
        batch.groupBy(F.md5(normalized_text(text_col)).alias("__fp"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    kept = batch.join(w_ids, on=id_col, how="left_semi")
    victims = (
        minhash_lsh_pairs(kept, id_col, text_col, threshold=threshold)
        .select(F.greatest("id_a", "id_b").alias(id_col))
        .distinct()
    )
    return kept.join(victims, on=id_col, how="left_anti")


def ingest_gate_stream(
    stream: DataFrame,
    corpus_path: str,
    accepted_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Start the streaming ingest gate; returns the StreamingQuery.

    ``corpus_path`` — parquet of the existing (already deduplicated)
    corpus; ``accepted_path`` — parquet root the gate appends accepted
    docs into (``batch_id=<n>`` subdirs); read it back with
    :func:`read_accepted`. AvailableNow drains the source then stops —
    the streaming equivalent of one ingest run; with
    ``available_now=False`` the gate runs continuously.
    """
    spark = stream.sparkSession

    def gate(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fresh = dedup_batch_within(batch, id_col, text_col, threshold)
        corpus = spark.read.parquet(corpus_path)
        prior = read_accepted(spark, accepted_path)
        if prior is not None:
            corpus = corpus.select(*fresh.columns).unionByName(
                prior.select(*fresh.columns)
            )
        survivors = incremental_new_docs(
            corpus, fresh, id_col, text_col, threshold=threshold
        )
        out = f"{accepted_path}/batch_id={batch_id}"
        if os.path.exists(out):  # crash replay: redo, don't double-append
            shutil.rmtree(out)
        survivors.write.parquet(out)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(gate)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_accepted(spark, accepted_path: str) -> Optional[DataFrame]:
    """All accepted docs so far (None before the first batch lands).
    The ``batch_id`` partition column is provenance; dropped here so the
    result unions cleanly with the corpus schema."""
    if not os.path.exists(accepted_path):
        return None
    subdirs = [d for d in os.listdir(accepted_path) if d.startswith("batch_id=")]
    if not subdirs:
        return None
    return spark.read.parquet(accepted_path).drop("batch_id")
