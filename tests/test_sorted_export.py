"""E173 globally-sorted shard export (sinks/shards.py r10 additions).

The contract: shard directories tile the key domain in ascending order,
rows within each shard are sorted by the same deterministic total order
the assignment used — so reading shard 1..n front-to-back replays the
corpus in global sorted order — with NO stage running a global sort
window (the assignment is the E171 exact-NTILE decomposition), no row
ever dropped (NULL keys route to shard 1), and re-exports byte-stable.
"""

import os

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.sinks.shards import (
    sorted_shard_assign,
    sorted_shard_manifest,
    write_sorted_shards,
)

N_SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_assignment_is_equal_frequency_and_ordered(spark, docs):
    man = (
        sorted_shard_manifest(docs, "n_chars", "doc_id", N_SHARDS)
        .orderBy("shard")
        .collect()
    )
    assert [r.shard for r in man] == list(range(1, N_SHARDS + 1))
    total = docs.count()
    q, rem = divmod(total, N_SHARDS)
    assert [r.n_rows for r in man] == [
        q + (1 if i < rem else 0) for i in range(N_SHARDS)
    ]
    # adjacent key ranges tile the domain
    for a, b in zip(man, man[1:]):
        assert a.max_key <= b.min_key


def test_write_read_round_trip_in_global_order(spark, docs, tmp_path):
    path = str(tmp_path / "sorted")
    write_sorted_shards(docs, path, "n_chars", "doc_id", N_SHARDS)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert len(dirs) == N_SHARDS
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert (
        back.drop("shard").exceptAll(docs.select(back.drop("shard").columns)).count()
        == 0
    )
    # global order law: walking shards ascending and rows in file order
    # yields a non-decreasing key sequence
    prev_max = None
    for d in dirs:
        rows = spark.read.parquet(f"{path}/{d}").select("n_chars").collect()
        keys = [r.n_chars for r in rows]
        assert keys == sorted(keys), d  # within-shard sorted
        if prev_max is not None and keys:
            assert prev_max <= keys[0], d
        if keys:
            prev_max = keys[-1]


def test_null_keys_route_to_shard_one_not_dropped(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 10), (3, 5), (4, None), (5, 20), (6, 1)],
        "doc_id long, k long",
    )
    assigned = sorted_shard_assign(df, "k", "doc_id", 2)
    assert assigned.count() == 6  # nothing dropped
    by_id = {r.doc_id: r.shard for r in assigned.collect()}
    assert by_id[1] == 1 and by_id[4] == 1  # NULLs first → shard 1
    assert by_id[6] == 1 and by_id[3] == 1  # smallest keys share shard 1
    assert by_id[5] == 2  # largest key lands last


def test_reexport_is_byte_stable(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    sample = docs.limit(200)
    write_sorted_shards(sample, p1, "n_chars", "doc_id", 2)
    write_sorted_shards(sample, p2, "n_chars", "doc_id", 2)
    for shard in ("shard=1", "shard=2"):
        rows1 = spark.read.parquet(f"{p1}/{shard}").collect()
        rows2 = spark.read.parquet(f"{p2}/{shard}").collect()
        assert rows1 == rows2, shard


def test_validation():
    with pytest.raises(ValueError, match="n_shards"):
        sorted_shard_assign(None, "k", "id", 0)
