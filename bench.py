"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Every query is forced end-to-end with the noop sink (full
materialization, no driver collect of large results). ``resync_noop``
measures the digest short-circuit: diffing a table against itself must
cost two scans, not a row-level diff — the reference's key economics
(README.md:24, Synchronizer.php:204-225).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_syncer_spark import queries as registry
from mysql_syncer_spark.digest import digests_equal
from mysql_syncer_spark.sources.catalog import configure_session, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: headline queries (name -> registry entry); a spread over the diff
#: kernels, digests, joins/aggs/windows, dedup, and ANN surface
HEADLINE = [
    "sync_merge_orders",
    "missing_rows_orders",
    "table_digest_orders",
    "partition_digests_orders",
    "agg_pricing_summary",
    "revenue_by_nation",
    "topk_per_group",
    "sessionize_events",
    "hourly_event_counts",
    "asof_join_events_orders",
    # ngram_jaccard_pairs_docs is deliberately NOT a headline: exact
    # all-pairs Jaccard is the small-scale verification baseline for
    # MinHash-LSH; its posting-list self-join is inherently quadratic in
    # document frequency and is not the path run at scale.
    "minhash_lsh_pairs_docs",
    "ann_topk_bruteforce",
    "embedding_near_dup_pairs",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("mysql-syncer-spark-bench")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qmap = registry.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        force(qmap[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)

    # digest short-circuit: unchanged-table re-sync cost
    orders = load_table(spark, SF_DIR, "orders")
    t0 = time.time()
    assert digests_equal(orders, orders)
    times["resync_noop"] = round(time.time() - t0, 3)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf else SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
