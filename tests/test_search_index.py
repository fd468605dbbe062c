"""Persisted inverted index (operators/search_index.py)."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.search_index import (
    search,
    search_index_read,
    search_index_write,
)
from mysql_syncer_spark.sources.bucketed import physical_plan


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return search_index_write(docs, "srchidx_t", num_buckets=8), docs


def test_search_matches_scan(idx):
    index, docs = idx
    for terms, mode in [(["spark"], "all"), (["spark", "merge"], "all"),
                        (["spark", "merge"], "any")]:
        got = {r["doc_id"] for r in search(index, terms, mode).collect()}
        lower = F.lower(F.col("text"))
        conds = [
            F.array_contains(F.split(lower, r"\s+"), t) for t in terms
        ]
        pred = conds[0]
        for c in conds[1:]:
            pred = (pred & c) if mode == "all" else (pred | c)
        want = {r["doc_id"] for r in docs.where(pred).collect()}
        assert got == want, (terms, mode)
        assert got  # non-trivial on the fixture vocabulary


def test_term_lookup_prunes_buckets(idx, spark):
    """THE point of bucketing by term: a term lookup must read a strict
    subset of the buckets (SelectedBucketsCount in the scan)."""
    index, _ = idx
    plan = physical_plan(search(index, ["spark"]))
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) < int(m.group(2)), plan


def test_reattach_fresh_session_path(idx, spark):
    index, _ = idx
    again = search_index_read(spark, "srchidx_t")
    a = {r["doc_id"] for r in search(again, ["spark"]).collect()}
    b = {r["doc_id"] for r in search(index, ["spark"]).collect()}
    assert a == b


def test_search_validation(idx):
    index, _ = idx
    with pytest.raises(ValueError):
        search(index, [])
    with pytest.raises(ValueError):
        search(index, ["x"], mode="phrase")
    with pytest.raises(ValueError):
        search_index_read(index.postings.sparkSession, "srchidx_missing")


def test_bm25_persisted_postings_equal_direct(spark, sf_dir):
    """The at-scale serving path: BM25 over a reusable postings frame
    must rank identically to the direct-from-corpus computation."""
    from mysql_syncer_spark.operators.search_index import (
        bm25_search,
        postings_tf_frame,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    direct = bm25_search(docs, ["spark", "merge"], k=10).collect()
    p = postings_tf_frame(docs).localCheckpoint(eager=True)
    served = bm25_search(p, ["spark", "merge"], k=10, postings=True).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in served]
    assert len(direct) == 10
    # tf dominance sanity: the top doc mentions a query term
    top = docs.where(F.col("doc_id") == direct[0]["doc_id"]).first()
    text = top["text"].lower()
    assert "spark" in text or "merge" in text


def test_bm25_validation(spark, sf_dir):
    from mysql_syncer_spark.operators.search_index import bm25_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        bm25_search(docs, [])


def test_phrase_search_planted(spark):
    from mysql_syncer_spark.operators.search_index import phrase_search

    rows = [
        (0, "the quick brown fox"),          # 1 occurrence
        (1, "quick brown quick brown fox"),  # 'quick brown' twice
        (2, "brown quick"),                  # reversed: no match
        (3, "quick  brown"),                 # double space still adjacent
        (4, None),
        (5, "quick"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_search(df, "Quick Brown").collect()}
    assert got == {0: 1, 1: 2, 3: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search(df, "single")


def test_phrase_with_repeated_word(spark):
    from mysql_syncer_spark.operators.search_index import phrase_search

    df = spark.createDataFrame(
        [(0, "order order order"), (1, "order fast order")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_search(df, "order order").collect()}
    assert got == {0: 2}


def test_bm25_served_from_persisted_index(idx, spark):
    """BM25 through the PERSISTED tf postings table: rank-identical to
    direct corpus scoring, term filter prunes to the query terms'
    buckets, reattach in a fresh catalog keeps serving."""
    import re

    from mysql_syncer_spark.operators.search_index import (
        bm25_search,
        bm25_search_indexed,
    )

    index, docs = idx
    direct = bm25_search(docs, ["spark", "merge"], k=10).collect()
    served = bm25_search_indexed(index, ["spark", "merge"], k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in direct] == [
        (r["doc_id"], r["score"]) for r in served
    ]
    assert direct  # non-trivial

    plan = physical_plan(bm25_search_indexed(index, ["spark", "merge"]))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan

    again = search_index_read(spark, "srchidx_t")
    assert again.postings_tf is not None
    re_served = bm25_search_indexed(again, ["spark", "merge"], k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in served] == [
        (r["doc_id"], r["score"]) for r in re_served
    ]


def test_bm25_indexed_requires_tf_table(idx):
    from mysql_syncer_spark.operators.search_index import (
        SearchIndex,
        bm25_search_indexed,
    )

    index, _ = idx
    legacy = SearchIndex(index.name, index.id_col, index.postings, None)
    with pytest.raises(ValueError, match="no tf postings"):
        bm25_search_indexed(legacy, ["spark"])


def test_reattach_fresh_catalog_restores_bucket_spec(idx, spark, tmp_path):
    """A fresh session sees index FILES but an empty catalog. Reattach
    must restore the BUCKET SPEC from the persisted meta (a plain
    re-register would silently lose bucket pruning) and serve identical
    results for both boolean search and indexed BM25."""
    import os
    import re
    import shutil

    from mysql_syncer_spark.operators.search_index import (
        bm25_search_indexed,
    )

    index, _ = idx
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    dst = tmp_path / "wh2"
    dst.mkdir()
    for suffix in ("_postings", "_postings_tf", "_srchmeta"):
        shutil.copytree(
            os.path.join(wh, f"srchidx_t{suffix}"),
            dst / f"srchidx_t{suffix}",
        )
    spark.sql(f"CREATE DATABASE srchre LOCATION '{dst}'")
    try:
        idx2 = search_index_read(spark, "srchre.srchidx_t")
        assert idx2.id_col == "doc_id"  # restored from meta
        a = {r["doc_id"] for r in search(idx2, ["spark"]).collect()}
        b = {r["doc_id"] for r in search(index, ["spark"]).collect()}
        assert a == b and a
        plan = physical_plan(search(idx2, ["spark"]))
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), plan
        got = bm25_search_indexed(idx2, ["spark", "merge"], k=5).collect()
        want = bm25_search_indexed(index, ["spark", "merge"], k=5).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
    finally:
        spark.sql("DROP DATABASE IF EXISTS srchre CASCADE")


class TestRRFFusion:
    """Reciprocal-rank fusion (E135): hand-computed fusion values,
    absent-from-list contributes exactly 0, id-tie-break ranks,
    fixed-order float fold, validation."""

    def test_hand_computed_fusion(self, spark):
        from mysql_syncer_spark.operators.search_index import rrf_fuse

        lex = spark.createDataFrame(
            [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
        )
        den = spark.createDataFrame(
            [(2, 0.9), (4, 0.8)], "doc_id long, score double"
        )
        out = {
            r["doc_id"]: (r["rank_0"], r["rank_1"], r["rrf_score"])
            for r in rrf_fuse([lex, den], "doc_id", k0=60).collect()
        }
        assert out[1] == (1, None, 1.0 / 61)
        assert out[2] == (2, 1, 1.0 / 62 + 1.0 / 61)
        assert out[3] == (3, None, 1.0 / 63)
        assert out[4] == (None, 2, 1.0 / 62)
        # doc 2 (in both lists) outranks every single-list doc
        top = max(out, key=lambda d: out[d][2])
        assert top == 2

    def test_rank_tiebreak_is_id(self, spark):
        from mysql_syncer_spark.operators.search_index import rrf_fuse

        a = spark.createDataFrame(
            [(7, 1.0), (3, 1.0)], "doc_id long, score double"
        )
        b = spark.createDataFrame(
            [(3, 2.0), (7, 2.0)], "doc_id long, score double"
        )
        out = {
            r["doc_id"]: (r["rank_0"], r["rank_1"])
            for r in rrf_fuse([a, b], "doc_id").collect()
        }
        # equal scores -> ascending id wins the earlier rank, per list
        assert out[3] == (1, 1) and out[7] == (2, 2)

    def test_three_list_fusion(self, spark):
        from mysql_syncer_spark.operators.search_index import rrf_fuse

        lists = [
            spark.createDataFrame([(1, 1.0)], "doc_id long, score double"),
            spark.createDataFrame([(1, 1.0)], "doc_id long, score double"),
            spark.createDataFrame([(2, 1.0)], "doc_id long, score double"),
        ]
        out = {
            r["doc_id"]: r["rrf_score"]
            for r in rrf_fuse(lists, "doc_id", k0=10).collect()
        }
        assert out[1] == 2.0 / 11 and out[2] == 1.0 / 11

    def test_hybrid_end_to_end(self, spark, sf_dir):
        """Hybrid output: k rows, every row carries at least one rank,
        rrf consistent with the carried ranks."""
        from mysql_syncer_spark.operators.search_index import (
            hybrid_search_rrf,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = emb.where(F.col("vec_id") == 0).first()["embedding"]
        rows = hybrid_search_rrf(
            docs, emb, ["spark", "merge", "join"], qv, k=10, n_each=20
        ).collect()
        assert len(rows) == 10
        for r in rows:
            assert r["bm25_rank"] is not None or r["dense_rank"] is not None
            want = (1.0 / (60 + r["bm25_rank"]) if r["bm25_rank"] else 0.0) \
                + (1.0 / (60 + r["dense_rank"]) if r["dense_rank"] else 0.0)
            assert abs(r["rrf_score"] - want) < 1e-6

    def test_validation(self, spark):
        from mysql_syncer_spark.operators.search_index import rrf_fuse

        one = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
        with pytest.raises(ValueError, match=">= 2 rankings"):
            rrf_fuse([one], "doc_id")
        with pytest.raises(ValueError, match="k0"):
            rrf_fuse([one, one], "doc_id", k0=0)
