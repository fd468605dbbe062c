"""End-to-end corpus curation pipeline: the job a training-data team
actually schedules, composed from the engine's operators and exported
as training shards.

Stages (each one optional-off via parameters):

1. **quality gate** — the Gopher rule set (operators/text.py
   ``with_gopher_rules``): codegen flags, filter pushes to the scan;
2. **exact dedup** — keep the min-id row per normalized text
   (operators/dedup.py ``dedup_exact``);
3. **near-dup dedup** — SimHash Hamming-≤d pairs → connected
   components → keep-BEST survivor per cluster (longest doc by
   default; ties min-id);
4. **PII redaction** — the cleaned text replaces the raw column;
5. **leakage-safe split** — deterministic hash split (near-dups were
   just collapsed, so remaining keys are independent);
6. **shard export** — ``split=<name>/shard=<k>/`` layout via the
   deterministic md5-bucket assignment (sinks/shards.py): re-exports
   move no existing doc, trainers partition-prune their own shards.

Scale notes: stages 1/4/5 are shuffle-free codegen; stage 2 is one
combinable shuffle; stage 3 is the banded SimHash join + CC (audited in
operators/cluster.py); the export is one writer task per (split,
shard). Stage boundaries that feed both a count and the next stage are
``localCheckpoint``ed so the report never re-runs a stage.

Reference anchor: this is the extension pipeline surface (SURVEY.md
§2.10); the reference's own end-to-end is the sync executor
(main.php → Synchronizer.php), mirrored in executor.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin

from mysql_syncer_spark.operators import dedup
from mysql_syncer_spark.operators.cluster import (
    cluster_keep_best,
    simhash_duplicate_clusters,
)
from mysql_syncer_spark.operators.sampling import hash_split
from mysql_syncer_spark.operators.text import with_gopher_rules, with_pii
from mysql_syncer_spark.sinks.shards import shard_stats, write_training_shards


@dataclass
class CurationReport:
    """Row counts per pipeline stage plus the export manifest."""

    docs_in: int = 0
    after_quality: int = 0
    after_exact_dedup: int = 0
    after_near_dedup: int = 0
    splits: dict = field(default_factory=dict)
    shards: list = field(default_factory=list)

    def as_dict(self) -> dict:
        return {
            "docs_in": self.docs_in,
            "after_quality": self.after_quality,
            "after_exact_dedup": self.after_exact_dedup,
            "after_near_dedup": self.after_near_dedup,
            "splits": self.splits,
            "shards": self.shards,
        }


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    near_dup_max_bits: int = 3,
    redact_pii: bool = True,
    split_weights: dict[str, float] | None = None,
    report: CurationReport | None = None,
) -> DataFrame:
    """Run quality → exact dedup → near-dup keep-best → PII → split and
    return ``(id_col, text_col, split)``. ``min_words=0`` skips the
    quality gate; ``near_dup_max_bits=0`` skips near-dup collapse;
    ``report`` (optional) is filled with per-stage counts — passing one
    materializes stage boundaries (the CLI does; library callers that
    want one lazy plan don't)."""
    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    counted = report is not None

    def mark(df: DataFrame, attr: str) -> DataFrame:
        if not counted:
            return df
        df = df.transform(pin)
        setattr(report, attr, df.count())
        return df

    cur = mark(docs.select(id_col, text_col), "docs_in")

    if min_words > 0:
        cur = with_gopher_rules(cur, text_col, min_words=min_words)
        cur = cur.where(F.col("gopher_keep")).select(id_col, text_col)
        cur = mark(cur, "after_quality")
    elif counted:
        report.after_quality = report.docs_in

    cur = mark(dedup.dedup_exact(cur, id_col, text_col), "after_exact_dedup")

    if near_dup_max_bits > 0:
        clusters = simhash_duplicate_clusters(
            cur, id_col, text_col, max_bits=near_dup_max_bits
        )
        cur = cluster_keep_best(
            cur.withColumn("__len", F.length(text_col)),
            clusters,
            "__len",
            id_col,
        ).drop("__len")
        cur = mark(cur, "after_near_dedup")
    elif counted:
        report.after_near_dedup = report.after_exact_dedup

    if redact_pii:
        cur = (
            with_pii(cur, text_col)
            .drop(text_col, "n_pii")
            .withColumnRenamed("redacted", text_col)
        )

    return hash_split(cur, id_col, weights).select(id_col, text_col, "split")


def curate_and_export(
    docs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    near_dup_max_bits: int = 3,
    redact_pii: bool = True,
    split_weights: dict[str, float] | None = None,
    n_shards: int = 8,
    max_records_per_file: int | None = None,
) -> CurationReport:
    """Curate and write ``out_path/split=<name>/shard=<k>/*.parquet``;
    returns the stage-count report with the per-shard manifest."""
    report = CurationReport()
    curated = curate_corpus(
        docs,
        id_col,
        text_col,
        min_words,
        near_dup_max_bits,
        redact_pii,
        split_weights,
        report,
    ).transform(pin)  # export + manifest reuse one pass

    report.splits = {
        r["split"]: r["n"]
        for r in curated.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # one deterministic layout: split is the outer directory, the
    # md5-bucket shard the inner one
    from mysql_syncer_spark.sinks.shards import with_shard

    sharded = with_shard(curated, id_col, n_shards)
    out = sharded.repartition(n_shards, "shard").sortWithinPartitions(id_col)
    writer = out.write.mode("overwrite").partitionBy("split", "shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_path)

    report.shards = [
        {"shard": r["shard"], "n_rows": r["n_rows"]}
        for r in shard_stats(curated, id_col, n_shards)
        .orderBy("shard")
        .collect()
    ]
    return report


def read_curated(
    spark: SparkSession,
    path: str,
    split: str | None = None,
    shards: list[int] | None = None,
) -> DataFrame:
    """Read an export; ``split``/``shards`` prune partitions (a trainer
    reads ``split='train'`` + its own shard list and the scan never
    touches the rest)."""
    df = spark.read.parquet(path)
    if split is not None:
        df = df.where(F.col("split") == split)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df
