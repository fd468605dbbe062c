"""Persisted MinHash corpus index: build / read / query parity / plan
shape / incremental append."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators import dedup
from mysql_syncer_spark.operators.minhash_index import (
    ensure_minhash_index,
    incremental_new_docs_indexed,
    minhash_index_append,
    minhash_index_exists,
    minhash_index_read,
    minhash_lsh_pairs_against_index,
)
from mysql_syncer_spark.operators.sampling import hash_bucket
from mysql_syncer_spark.sources.bucketed import physical_plan


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def split(docs):
    b = hash_bucket("doc_id")
    return docs.where(b < 9000), docs.where(b >= 9000)


@pytest.fixture(scope="module")
def idx(spark, split, tmp_path_factory):
    corpus, _ = split
    loc = tmp_path_factory.mktemp("mhidx_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS mhidxtest LOCATION '{loc}'")
    yield ensure_minhash_index(
        corpus, "mhidxtest.docs", num_hashes=16, bands=4, num_buckets=8
    )
    spark.sql("DROP DATABASE mhidxtest CASCADE")


def test_exists_and_meta_roundtrip(spark, idx):
    assert minhash_index_exists(spark, "mhidxtest.docs")
    assert (idx.id_col, idx.k, idx.num_hashes, idx.bands, idx.num_buckets) \
        == ("doc_id", 5, 16, 4, 8)
    assert not minhash_index_exists(spark, "mhidxtest.nope")


def test_param_mismatch_raises(spark, split, idx):
    corpus, _ = split
    with pytest.raises(ValueError, match="parameter-distinct"):
        ensure_minhash_index(
            corpus, "mhidxtest.docs", num_hashes=32, bands=8
        )


def test_pairs_match_recompute_variant(spark, split, idx):
    """Index-served bipartite LSH ≡ the recompute-everything variant,
    row for row (same hash family, same banding, same verify)."""
    corpus, incoming = split
    expected = sorted(
        (r["id_new"], r["id_old"], r["jaccard_est"])
        for r in dedup.minhash_lsh_pairs_between(
            corpus, incoming, num_hashes=16, bands=4, threshold=0.7
        ).collect()
    )
    got = sorted(
        (r["id_new"], r["id_old"], r["jaccard_est"])
        for r in minhash_lsh_pairs_against_index(
            idx, incoming, threshold=0.7
        ).collect()
    )
    assert got == expected


def test_gate_matches_recompute_variant(spark, split, idx):
    corpus, incoming = split
    expected = sorted(
        r["doc_id"]
        for r in dedup.incremental_new_docs(
            corpus, incoming, num_hashes=16, bands=4, threshold=0.7
        ).collect()
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_new_docs_indexed(
            idx, incoming, threshold=0.7
        ).collect()
    )
    assert got == expected


def test_plan_corpus_side_reads_index_only(spark, split, idx):
    """THE point of the index: at query time the corpus is never
    scanned, shingled, or signed. Gate on the physical plan: (a) the
    shingle-explode appears exactly once (incoming side; the recompute
    variant carries it for the corpus too), (b) the index tables are
    scanned, (c) the buckets scan is read bucket-aware — its side of
    the candidate join needs no Exchange."""
    corpus, incoming = split
    indexed = physical_plan(
        minhash_lsh_pairs_against_index(idx, incoming, threshold=0.7)
    )
    recompute = physical_plan(
        dedup.minhash_lsh_pairs_between(
            corpus, incoming, num_hashes=16, bands=4, threshold=0.7,
            # lazy form: the production default pins both signature
            # frames (localCheckpoint), which hides the shingle subtree
            # behind a LogicalRDD — this gate compares plan TOPOLOGY
            materialize_sigs=False,
        )
    )
    # the shingle-position explode; the formatted plan prints the
    # incoming signature subtree once per consumer (bucket + verify —
    # they share one exchange at runtime), so compare across variants:
    # the corpus half of the recompute plan must be entirely absent.
    marker = "sequence(1, greatest("
    n_idx, n_re = indexed.count(marker), recompute.count(marker)
    assert n_idx * 2 == n_re, (n_idx, n_re)
    assert n_idx <= 2, indexed
    assert "docs_buckets" in indexed and "docs_sig" in indexed
    assert "Bucketed: true" in indexed, indexed


def test_reattach_from_files_only(spark, split, idx, tmp_path):
    """A fresh session sees the index FILES but an empty catalog (the
    in-memory catalog dies with the session — and the CLI runs
    index-build and ingest as separate processes). Simulate in-JVM by
    copying the index files under a database the catalog has no tables
    for: read must re-register them, restore the bucket spec, and serve
    identical results."""
    import shutil

    corpus, incoming = split
    src = spark.catalog.getDatabase("mhidxtest").locationUri.replace(
        "file:", ""
    )
    dst = tmp_path / "wh2"
    shutil.copytree(src, dst)
    spark.sql(f"CREATE DATABASE mhidxre LOCATION '{dst}'")
    try:
        assert minhash_index_exists(spark, "mhidxre.docs")
        idx2 = minhash_index_read(spark, "mhidxre.docs")
        assert (idx2.num_hashes, idx2.bands, idx2.num_buckets) == (16, 4, 8)
        got = sorted(
            r["doc_id"]
            for r in incremental_new_docs_indexed(
                idx2, incoming, threshold=0.7
            ).collect()
        )
        expected = sorted(
            r["doc_id"]
            for r in incremental_new_docs_indexed(
                idx, incoming, threshold=0.7
            ).collect()
        )
        assert got == expected
        # the restored spec is real bucket metadata, not a plain scan
        plan = physical_plan(
            minhash_lsh_pairs_against_index(idx2, incoming, threshold=0.7)
        )
        assert "Bucketed: true" in plan
    finally:
        spark.sql("DROP DATABASE IF EXISTS mhidxre CASCADE")


def test_read_missing_raises(spark):
    with pytest.raises(ValueError, match="not found"):
        minhash_index_read(spark, "mhidxtest.never_built")


def test_compact_removes_replay_duplicates(spark, split, idx, tmp_path):
    """A replayed append duplicates index rows (benign for the gate);
    compaction must restore one-row-per-doc without changing gate
    output. Runs on a COPY of the module index so later tests see the
    original untouched."""
    import shutil

    from mysql_syncer_spark.operators.minhash_index import (
        minhash_index_compact,
    )

    corpus, incoming = split
    src = spark.catalog.getDatabase("mhidxtest").locationUri.replace(
        "file:", ""
    )
    dst = tmp_path / "whc"
    shutil.copytree(src, dst)
    spark.sql(f"CREATE DATABASE mhidxcmp LOCATION '{dst}'")
    try:
        idx2 = minhash_index_read(spark, "mhidxcmp.docs")
        batch = incoming.limit(20)
        minhash_index_append("mhidxcmp.docs", batch, idx2)
        minhash_index_append("mhidxcmp.docs", batch, idx2)  # replay
        idx2 = minhash_index_read(spark, "mhidxcmp.docs")
        n_docs = corpus.count() + 20
        assert idx2.signatures.count() == n_docs + 20  # dup rows present
        gate_before = sorted(
            r["doc_id"]
            for r in incremental_new_docs_indexed(
                idx2, incoming, threshold=0.7
            ).collect()
        )
        minhash_index_compact(spark, "mhidxcmp.docs")
        idx3 = minhash_index_read(spark, "mhidxcmp.docs")
        assert idx3.signatures.count() == n_docs
        assert idx3.buckets.count() == n_docs * idx3.bands
        gate_after = sorted(
            r["doc_id"]
            for r in incremental_new_docs_indexed(
                idx3, incoming, threshold=0.7
            ).collect()
        )
        assert gate_after == gate_before
    finally:
        spark.sql("DROP DATABASE IF EXISTS mhidxcmp CASCADE")


def test_append_folds_batch_in(spark, split, idx):
    """After appending the incoming batch, re-running the gate against
    the SAME incoming must admit nothing (every doc now collides with
    its own fingerprint in the index)."""
    corpus, incoming = split
    admitted = incremental_new_docs_indexed(idx, incoming, threshold=0.7)
    minhash_index_append("mhidxtest.docs", admitted, idx)
    again = incremental_new_docs_indexed(idx, incoming, threshold=0.7)
    assert again.count() == 0
