"""Persisted MinHash corpus index: sign the corpus ONCE, ingest O(batch).

``dedup.incremental_new_docs`` re-shingles and re-signs the entire
corpus on every incoming batch — a linear pass that is correct but, at
100 TB, turns a daily ingest job into a daily full-corpus job. The fix
the reference's own economics point at (the digest short-circuit idea of
Synchronizer.php:193-230 — never redo work whose inputs didn't change)
is a persisted signature index:

* ``{name}_sig``      — ``(doc_id, h0..h{n-1})``, bucketed by doc_id:
  the verify side of the LSH join reads it pre-partitioned on the join
  key (no corpus shuffle).
* ``{name}_buckets``  — ``(doc_id, band, bucket)``, bucketed by
  (band, bucket): the candidate join reads the corpus side with ZERO
  Exchange — only the (small) batch side shuffles.
* ``{name}_fp``       — distinct content fingerprints, bucketed by fp:
  the exact-dup anti-join's corpus side.
* ``{name}_meta``     — one row of build parameters; reads validate
  against it so a query can never silently mix hash families.

Bucketing metadata only exists through the session catalog
(``saveAsTable``) and the default catalog is in-memory, so a FRESH
session starts blind to the index even though its parquet files are on
disk. ``minhash_index_read`` therefore RE-ATTACHES: if a table is
missing from the catalog but its files exist at the expected managed
location, it issues ``CREATE TABLE ... USING parquet CLUSTERED BY ...
LOCATION`` to restore both the data and the bucket spec — which is what
lets the CLI run ``index-build`` today and ``ingest`` tomorrow in a
different process (and is the local stand-in for a real deployment's
Hive metastore, where none of this is needed).

Incremental maintenance: after admitting a batch, append its signatures
/ buckets / fingerprints (``minhash_index_append``) — the daily cost
stays O(batch) forever, matching the docstring promise of
``dedup.minhash_lsh_pairs_between``.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin

from mysql_syncer_spark.operators.dedup import (
    band_bucket_frame,
    minhash_signatures,
)
from mysql_syncer_spark.operators.text import normalized_text
from mysql_syncer_spark.sources.bucketed import write_bucketed


class MinhashIndex(NamedTuple):
    """Handle to a persisted corpus index (frames + build parameters)."""

    signatures: DataFrame  # (id_col, h0..h{num_hashes-1})
    buckets: DataFrame  # (id_col, band, bucket)
    fingerprints: DataFrame  # (fp)
    id_col: str
    k: int
    num_hashes: int
    bands: int
    num_buckets: int


def _table_location(spark: SparkSession, table: str) -> str | None:
    """Expected managed location of ``table`` (db location or warehouse
    dir); None when the database itself doesn't exist."""
    parts = table.split(".")
    if len(parts) == 2:
        try:
            loc = spark.catalog.getDatabase(parts[0]).locationUri
        except Exception:
            return None
        return f"{loc}/{parts[1]}"
    return f"{spark.conf.get('spark.sql.warehouse.dir')}/{table}"


def _location_files_exist(spark: SparkSession, path: str) -> bool:
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _drop_stale(spark: SparkSession, table: str) -> None:
    """Drop a registered table AND purge an orphaned managed location a
    previous session may have left behind: the in-memory catalog's
    metadata dies with the session but its files don't, and saveAsTable
    (correctly) refuses to create a managed table over a non-empty
    location. Uses the Hadoop FileSystem API so the purge is correct on
    HDFS/S3, not just local disk."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = _table_location(spark, table)
    if path is None:
        return  # db itself gone ⇒ nothing stale under it to purge
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _reattach_table(
    spark: SparkSession, table: str, cluster_sql: str = ""
) -> bool:
    """Make ``table`` queryable in THIS session: already registered, or
    files exist at the expected location (re-register them, restoring
    the bucket spec via ``cluster_sql``), else False. The explicit
    column list comes from the parquet footer — CREATE TABLE with a
    bucket spec requires a declared schema."""
    if spark.catalog.tableExists(table):
        return True
    path = _table_location(spark, table)
    if path is None or not _location_files_exist(spark, path):
        return False
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING parquet "
        f"{cluster_sql} LOCATION '{path}'"
    )
    return True


def _reattach(spark: SparkSession, name: str) -> bool:
    """Re-attach all four index tables from their on-disk files; True
    iff the complete index is queryable afterwards."""
    if not _reattach_table(spark, f"{name}_meta"):
        return False
    meta = spark.table(f"{name}_meta").first()
    idc, nb = meta["id_col"], meta["num_buckets"]
    return all(
        (
            _reattach_table(
                spark, f"{name}_sig",
                f"CLUSTERED BY (`{idc}`) SORTED BY (`{idc}`) INTO {nb} BUCKETS",
            ),
            _reattach_table(
                spark, f"{name}_buckets",
                f"CLUSTERED BY (band, bucket) "
                f"SORTED BY (band, bucket, `{idc}`) INTO {nb} BUCKETS",
            ),
            _reattach_table(
                spark, f"{name}_fp",
                f"CLUSTERED BY (fp) SORTED BY (fp) INTO {nb} BUCKETS",
            ),
        )
    )


def minhash_index_write(
    corpus: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    num_buckets: int = 32,
) -> None:
    """Build and persist the three index tables (+ meta) under catalog
    name prefix ``name``. The signature table is written first and the
    banding table is derived by READING IT BACK — the expensive map work
    (shingle explode → md5 → partial minima) runs exactly once and
    nothing is pinned in executor memory, which is what lets this run
    over a 100 TB corpus as a plain batch job."""
    spark = corpus.sparkSession
    for suf in ("_sig", "_buckets", "_fp", "_meta"):
        _drop_stale(spark, f"{name}{suf}")
    sig = minhash_signatures(corpus, id_col, text_col, k, num_hashes)
    write_bucketed(sig, f"{name}_sig", [id_col], num_buckets)
    sig_stored = spark.table(f"{name}_sig")
    write_bucketed(
        band_bucket_frame(sig_stored, id_col, num_hashes, bands),
        f"{name}_buckets",
        ["band", "bucket"],
        num_buckets,
        sort_cols=["band", "bucket", id_col],
    )
    fps = corpus.select(
        F.md5(normalized_text(text_col)).alias("fp")
    ).distinct()
    write_bucketed(fps, f"{name}_fp", ["fp"], num_buckets)
    meta = spark.createDataFrame(
        [(id_col, k, num_hashes, bands, num_buckets)],
        "id_col string, k int, num_hashes int, bands int, num_buckets int",
    )
    meta.write.mode("overwrite").saveAsTable(f"{name}_meta")


def minhash_index_exists(spark: SparkSession, name: str) -> bool:
    """True iff the index is usable from THIS session: registered in
    the catalog, or re-attachable from its on-disk files (a fresh
    session after ``index-build`` ran elsewhere)."""
    return _reattach(spark, name)


def minhash_index_read(spark: SparkSession, name: str) -> MinhashIndex:
    if not _reattach(spark, name):
        raise ValueError(
            f"minhash index {name!r} not found: neither registered in "
            "this session nor present on disk — run minhash_index_write "
            "(CLI: index-build) first"
        )
    meta = spark.table(f"{name}_meta").first()
    return MinhashIndex(
        signatures=spark.table(f"{name}_sig"),
        buckets=spark.table(f"{name}_buckets"),
        fingerprints=spark.table(f"{name}_fp"),
        id_col=meta["id_col"],
        k=meta["k"],
        num_hashes=meta["num_hashes"],
        bands=meta["bands"],
        num_buckets=meta["num_buckets"],
    )


def ensure_minhash_index(
    corpus: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    num_buckets: int = 32,
) -> MinhashIndex:
    """Read the index if this session already built it, else build it.
    Callers encode the parameterization in ``name`` (the meta check
    below catches a mismatch loudly rather than silently)."""
    spark = corpus.sparkSession
    if not minhash_index_exists(spark, name):
        minhash_index_write(
            corpus, name, id_col, text_col, k, num_hashes, bands, num_buckets
        )
    idx = minhash_index_read(spark, name)
    if (idx.id_col, idx.k, idx.num_hashes, idx.bands) != (
        id_col, k, num_hashes, bands,
    ):
        raise ValueError(
            f"minhash index {name!r} was built with "
            f"{(idx.id_col, idx.k, idx.num_hashes, idx.bands)}, "
            f"requested {(id_col, k, num_hashes, bands)} — use a "
            "parameter-distinct name"
        )
    return idx


def minhash_index_append(
    index_name: str,
    batch: DataFrame,
    index: MinhashIndex,
    text_col: str = "text",
) -> None:
    """Fold an admitted batch into the index (bucketed append, same
    layout): tomorrow's ingest dedups against today's admissions too.
    The admitted batch usually DERIVES from reads of these very tables
    (the admit→append flow), so its lineage is cut up front — batches
    are small by definition; then the signature frame is checkpointed
    once so the two appends (sig + buckets) don't re-sign it."""
    id_col, nb = index.id_col, index.num_buckets
    batch = batch.transform(pin, required=True)
    sig = minhash_signatures(
        batch, id_col, text_col, index.k, index.num_hashes
    ).transform(pin, required=True)
    write_bucketed(sig, f"{index_name}_sig", [id_col], nb, mode="append")
    write_bucketed(
        band_bucket_frame(sig, id_col, index.num_hashes, index.bands),
        f"{index_name}_buckets",
        ["band", "bucket"],
        nb,
        sort_cols=["band", "bucket", id_col],
        mode="append",
    )
    write_bucketed(
        batch.select(F.md5(normalized_text(text_col)).alias("fp")).distinct(),
        f"{index_name}_fp",
        ["fp"],
        nb,
        mode="append",
    )
    # self-heal the writing session's relation cache: inserts refresh by
    # output path, but a handle read BEFORE this append (idx.*) may pin a
    # stale file listing — explicit refresh makes the next read complete
    spark = batch.sparkSession
    for suf in ("_sig", "_buckets", "_fp"):
        spark.catalog.refreshTable(f"{index_name}{suf}")


def minhash_index_compact(spark: SparkSession, name: str) -> None:
    """Rewrite the three data tables with duplicates removed. Replayed
    streaming appends accumulate BENIGN duplicate rows (the gate's
    anti-joins are idempotent under them); compaction reclaims the
    space and restores one-row-per-doc invariants. Pattern: write fresh
    bucketed tables under a temp name, then drop-and-rename — the index
    stays readable until the swap, and a crash mid-compact leaves
    either the old or the new tables, never a half-written one."""
    idx = minhash_index_read(spark, name)
    nb, idc = idx.num_buckets, idx.id_col
    tmp = f"{name}_compact_tmp"
    for suf in ("_sig", "_buckets", "_fp"):
        _drop_stale(spark, f"{tmp}{suf}")
    write_bucketed(
        idx.signatures.dropDuplicates([idc]), f"{tmp}_sig", [idc], nb
    )
    write_bucketed(
        idx.buckets.distinct(), f"{tmp}_buckets", ["band", "bucket"], nb,
        sort_cols=["band", "bucket", idc],
    )
    write_bucketed(idx.fingerprints.distinct(), f"{tmp}_fp", ["fp"], nb)
    for suf in ("_sig", "_buckets", "_fp"):
        _drop_stale(spark, f"{name}{suf}")
        spark.sql(f"ALTER TABLE {tmp}{suf} RENAME TO {name}{suf}")


def minhash_lsh_pairs_against_index(
    index: MinhashIndex,
    incoming: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    materialize_batch: bool = False,
) -> DataFrame:
    """Bipartite LSH near-dup pairs ``(id_new, id_old, jaccard_est)``
    with the corpus side served ENTIRELY from the persisted index: the
    candidate join reads ``{name}_buckets`` pre-bucketed on
    (band, bucket) — zero corpus Exchange, zero corpus re-shingling —
    and the verify join reads ``{name}_sig`` pre-bucketed on the id.
    Only the incoming batch is signed, so per-ingest work is O(batch).
    Same topology and identical output as
    :func:`dedup.minhash_lsh_pairs_between`."""
    id_col, num_hashes = index.id_col, index.num_hashes
    sig_new = minhash_signatures(
        incoming, id_col, text_col, index.k, num_hashes
    )
    if materialize_batch:
        # the signature feeds TWO join branches (candidate buckets +
        # verify) whose exchange keys differ, so Catalyst re-runs the
        # shingle-explode + wide-MIN pipeline per branch. The batch is
        # small by the ingest-gate scenario's definition — materialize
        # it once (id + num_hashes longs per doc) so per-ingest work is
        # O(batch) exactly once. Opt-in: the lazy form keeps the full
        # lineage for plan-shape gates and non-gate callers.
        sig_new = sig_new.transform(pin, required=True)
    cand = (
        band_bucket_frame(sig_new, id_col, num_hashes, index.bands, "id_new")
        .join(
            index.buckets.select(
                F.col(id_col).alias("id_old"), "band", "bucket"
            ),
            on=["band", "bucket"],
        )
        .select("id_new", "id_old")
        .distinct()
    )
    sa = sig_new.select(*[F.col(c).alias(f"a_{c}") for c in sig_new.columns])
    sb = index.signatures.select(
        *[F.col(c).alias(f"b_{c}") for c in index.signatures.columns]
    )
    matches = sum(
        F.when(F.col(f"a_h{i}") == F.col(f"b_h{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        cand.join(sa, cand.id_new == F.col(f"a_{id_col}"))
        .join(sb, cand.id_old == F.col(f"b_{id_col}"))
        .withColumn(
            "jaccard_est", matches.cast("double") / F.lit(num_hashes)
        )
        .where(F.col("jaccard_est") >= threshold)
        .select("id_new", "id_old", "jaccard_est")
    )


def incremental_new_docs_indexed(
    index: MinhashIndex,
    incoming: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Index-served twin of :func:`dedup.incremental_new_docs` — rows of
    ``incoming`` that are neither exact-fingerprint copies nor LSH
    near-dups of the indexed corpus. Identical output; the corpus is
    never scanned, shingled, or signed at query time."""
    id_col = index.id_col
    fresh = incoming.alias("i").join(
        index.fingerprints,
        F.md5(normalized_text(f"i.{text_col}")) == F.col("fp"),
        "left_anti",
    )
    # fresh feeds the signing pipeline AND the final anti-join; the
    # batch is ingest-sized, so materialize it once rather than paying
    # the fp anti-join per consumer (same rationale as
    # materialize_batch below).
    fresh = fresh.transform(pin, required=True)
    near = (
        minhash_lsh_pairs_against_index(
            index, fresh, text_col, threshold, materialize_batch=True
        )
        .select(F.col("id_new").alias(id_col))
        .distinct()
    )
    return fresh.join(near, on=id_col, how="left_anti")
