"""Round-5 curation operators: domain-mixture resampling, document
chunking, keep-best survivor selection, semantic dedup, shard export.

Each also has an exact DuckDB oracle row (test_oracle_parity.py); these
tests pin the SEMANTIC properties the oracle-hash comparison can't
express (mixture ratios, chunk coverage, survivor choice, shard
stability under re-export)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------


def test_mixture_sample_hits_target_ratios(spark):
    from mysql_syncer_spark.operators.sampling import mixture_sample

    rows = (
        [(i, "web") for i in range(600)]
        + [(i + 1000, "books") for i in range(100)]
        + [(i + 2000, "code") for i in range(300)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(
        df, "source", "doc_id", {"web": 0.6, "books": 0.1, "code": 0.3}
    )
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # books is the bottleneck at exactly its weight: everything is kept
    assert got == {"web": 600, "books": 100, "code": 300}


def test_mixture_sample_downsamples_overrepresented_group(spark):
    from mysql_syncer_spark.operators.sampling import mixture_sample

    rows = [(i, "web") for i in range(900)] + [
        (i + 1000, "books") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(
        df, "source", "doc_id", {"web": 0.5, "books": 0.5}
    )
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # books bottleneck: t = 200 → 100 web + 100 books (exact 50/50)
    assert got == {"web": 100, "books": 100}


def test_mixture_sample_drops_unweighted_groups_and_is_deterministic(spark):
    from mysql_syncer_spark.operators.sampling import mixture_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out1 = mixture_sample(df, "source", "doc_id", {"a": 0.7, "b": 0.3})
    assert out1.where(F.col("source") == "c").count() == 0
    ids1 = {r["doc_id"] for r in out1.collect()}
    ids2 = {
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(7), "source", "doc_id", {"a": 0.7, "b": 0.3}
        ).collect()
    }
    assert ids1 == ids2  # partitioning-independent


def test_mixture_sample_bad_args(spark):
    from mysql_syncer_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        mixture_sample(df, "source", "doc_id", {})
    with pytest.raises(ValueError):
        mixture_sample(df, "source", "doc_id", {"a": 0.0})


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_covers_every_token(spark):
    from mysql_syncer_spark.operators.chunk import chunk_documents

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=32, stride=24).collect()
    # 100 tokens → 1 + ceil(68/24) = 4 chunks
    assert [r["chunk_id"] for r in sorted(out, key=lambda r: r["chunk_id"])] \
        == [0, 1, 2, 3]
    toks = set()
    for r in out:
        toks.update(r["chunk_text"].split(" "))
    assert toks == {f"t{i}" for i in range(100)}
    last = max(out, key=lambda r: r["chunk_id"])
    assert last["chunk_text"].endswith("t99")  # last window reaches the end
    assert last["n_chunk_tokens"] == 100 - 3 * 24


def test_chunk_documents_overlap_and_window_size(spark):
    from mysql_syncer_spark.operators.chunk import chunk_documents

    text = " ".join(str(i) for i in range(60))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r["chunk_id"]: r for r in
           chunk_documents(df, chunk_tokens=32, stride=24).collect()}
    c0 = out[0]["chunk_text"].split(" ")
    c1 = out[1]["chunk_text"].split(" ")
    assert len(c0) == 32
    assert c0[24:] == c1[:8]  # 8-token overlap
    # 60 tokens → 3 windows: [0,32), [24,56), [48,60)
    assert out[1]["n_chunk_tokens"] == 32
    assert out[2]["n_chunk_tokens"] == 60 - 48


def test_chunk_documents_short_and_empty_docs(spark):
    from mysql_syncer_spark.operators.chunk import chunk_documents

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=32, stride=24).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0]["n_chunk_tokens"] == 3
    for d in (2, 3):  # empty docs yield exactly one empty chunk
        assert len(by_id[d]) == 1
        assert by_id[d][0]["chunk_text"] == ""
        assert by_id[d][0]["n_chunk_tokens"] == 0


def test_chunk_documents_bad_args(spark):
    from mysql_syncer_spark.operators.chunk import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, stride=11)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, stride=0)


# ---------------------------------------------------------------------------
# cluster_keep_best / semantic_dedup
# ---------------------------------------------------------------------------


def test_cluster_keep_best_prefers_high_score(spark):
    from mysql_syncer_spark.operators.cluster import (
        cluster_keep_best,
        duplicate_clusters,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (10, 5), (20, 7)],
        "doc_id long, score long",
    )
    clusters = duplicate_clusters(
        spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    )
    kept = {r["doc_id"] for r in
            cluster_keep_best(df, clusters, "score").collect()}
    # cluster {1,2,3}: 2 and 3 tie at 99 → min id 2 wins; unclustered pass
    assert kept == {2, 10, 20}


def test_semantic_dedup_keeps_one_per_component(spark):
    from mysql_syncer_spark.operators.dedup import semantic_dedup

    # 1↔2 near-identical, 3 orthogonal; same label block
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], "a"),
            (2, [0.999, 0.01, 0.0], "a"),
            (3, [0.0, 1.0, 0.0], "a"),
            (4, [1.0, 0.0, 0.0], "b"),  # other block: kept
        ],
        "vec_id long, embedding array<double>, label string",
    )
    kept = {r["vec_id"] for r in
            semantic_dedup(df, threshold=0.95).collect()}
    assert kept == {1, 3, 4}


# ---------------------------------------------------------------------------
# shard export
# ---------------------------------------------------------------------------


def test_shard_roundtrip_and_stability(spark, docs, tmp_path):
    from mysql_syncer_spark.sinks.shards import (
        read_training_shards,
        shard_stats,
        with_shard,
        write_training_shards,
    )

    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", 4)
    back = read_training_shards(spark, path)
    assert back.count() == docs.count()
    # stats manifest agrees with what landed on disk
    stats = {r["shard"]: r["n_rows"]
             for r in shard_stats(docs, "doc_id", 4).collect()}
    on_disk = {r["shard"]: r["n"] for r in
               back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert stats == on_disk
    assert set(stats) <= set(range(4))
    # assignment is a pure key function: re-sharding a REPARTITIONED
    # frame moves no doc (incremental re-export stability)
    a = {(r["doc_id"], r["shard"])
         for r in with_shard(docs, "doc_id", 4).select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"])
         for r in with_shard(docs.repartition(13), "doc_id", 4)
         .select("doc_id", "shard").collect()}
    assert a == b


def test_shard_subset_read_prunes_partitions(spark, docs, tmp_path):
    from mysql_syncer_spark.sinks.shards import (
        read_training_shards,
        write_training_shards,
    )

    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", 4)
    sub = read_training_shards(spark, path, shards=[1, 2])
    assert {r["shard"] for r in sub.select("shard").distinct().collect()} \
        == {1, 2}
    # partition pruning visible in the physical plan (PartitionFilters
    # on the shard column, not a post-scan Filter of all four dirs)
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_write_shards_max_records_per_file(spark, docs, tmp_path):
    import glob

    from mysql_syncer_spark.sinks.shards import write_training_shards

    path = str(tmp_path / "shards")
    write_training_shards(
        docs, path, "doc_id", 2, max_records_per_file=10
    )
    files = glob.glob(f"{path}/shard=*/*.parquet")
    n = docs.count()
    assert len(files) >= n // 10  # files split at the record cap
