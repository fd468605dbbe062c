"""r13 hygiene: driver-side memo bounds/eviction (VERDICT r12 item 7)
and the ADVICE r12 edge fixes (non-identifier column names in the
parse-once vector builders; lineage_cut_every validation)."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark import canon
from mysql_syncer_spark.operators import similarity
from mysql_syncer_spark.sources import catalog


@pytest.fixture
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestParseOncePathNames:
    def test_weird_column_name_resolves(self, emb):
        """'vec-1' must resolve as a column (old F.col behavior), not
        parse as `vec minus 1` (ADVICE r12, similarity.py fast paths)."""
        odd = emb.select(
            "vec_id", F.col("embedding").alias("vec-1")
        )
        got = odd.select(
            similarity.dot("vec-1", "vec-1").alias("d"),
            similarity.l2_norm("vec-1").alias("n"),
            similarity.sign_bucket("vec-1", 4).alias("b"),
        ).first()
        want = emb.select(
            similarity.dot("embedding", "embedding").alias("d"),
            similarity.l2_norm("embedding").alias("n"),
            similarity.sign_bucket("embedding", 4).alias("b"),
        ).first()
        assert got == want

    def test_bare_name_tree_unchanged(self, emb):
        """Backtick quoting parses to the identical unresolved
        attribute — same plan text as the pre-quote fast path."""
        a = emb.select(similarity.dot("embedding", "embedding").alias("d"))
        b = emb.select(
            similarity.dot(
                F.col("embedding").cast("array<float>").cast("array<float>"),
                F.col("embedding"),
            ).alias("d")
        )
        # value equality is the contract; the double cast above is a
        # no-op so both compute the same fold
        assert a.first()["d"] == pytest.approx(b.first()["d"])


class TestLoopValidation:
    def test_lineage_cut_every_validated(self, emb):
        nodes = emb.select(F.col("vec_id").alias("id"))
        edges = emb.select(
            F.col("vec_id").alias("src"), F.col("vec_id").alias("dst")
        )
        with pytest.raises(ValueError, match="lineage_cut_every"):
            similarity.pagerank(
                nodes, edges, iters=2, lineage_cut_every=0
            )
        seeds = nodes.withColumn("score_micro", F.lit(100))
        with pytest.raises(ValueError, match="lineage_cut_every"):
            similarity.propagate_scores(
                seeds, edges, iters=2, lineage_cut_every=-1
            )


class TestMemoHygiene:
    def test_load_table_cache_evicts_other_sessions(self, spark, sf_dir):
        catalog.load_table(spark, sf_dir, "orders")
        uuid = spark._jsparkSession.sessionUUID()
        fake = ("dead-session-uuid", "/nowhere", "orders")
        catalog._LOAD_TABLE_CACHE[fake] = catalog._LOAD_TABLE_CACHE[
            next(iter(catalog._LOAD_TABLE_CACHE))
        ]
        catalog.load_table(spark, sf_dir, "nation")
        assert fake not in catalog._LOAD_TABLE_CACHE
        assert all(k[0] == uuid for k in catalog._LOAD_TABLE_CACHE)

    def test_row_hash_cache_bounded_and_gateway_keyed(self, spark, orders):
        canon.row_hash_col(orders)
        assert len(canon._ROW_HASH_CACHE) <= canon._ROW_HASH_CACHE_MAX
        token = canon._gateway_token(orders)
        assert token != 0
        assert all(k[0] == token for k in canon._ROW_HASH_CACHE)
        # synthesize distinct schemas past the cap: stays bounded
        for i in range(canon._ROW_HASH_CACHE_MAX + 5):
            canon.row_hash_col(
                orders.select(F.col("o_orderkey").alias(f"c{i}"))
            )
        assert len(canon._ROW_HASH_CACHE) <= canon._ROW_HASH_CACHE_MAX
        # stale-gateway entries are evicted on insert
        stale_key = ((token + 1), ("x", "bigint"))
        canon._ROW_HASH_CACHE[stale_key] = canon.row_hash_col(orders)
        canon.row_hash_col(orders.select("o_orderkey"))
        assert stale_key not in canon._ROW_HASH_CACHE
