"""Wave-16 equivalence proof: parse-once dot/l2_norm/sign_bucket paths
emit byte-identical frames to the HEAD implementation on sf0.1."""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def load_shadow(rel: str, name: str) -> object:
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"HEAD:{rel}"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = f"/tmp/{name}.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def same(a, b, label: str) -> None:
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    n1, n2 = a.count(), b.count()
    ok = d1 == 0 and d2 == 0 and n1 == n2
    print(f"{'OK ' if ok else 'FAIL'} {label}: rows {n1}/{n2}, diff {d1}/{d2}",
          flush=True)
    if not ok:
        sys.exit(1)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators import dedup as ndedup
    from mysql_syncer_spark.operators import similarity as nsim
    from mysql_syncer_spark.sources.catalog import configure_session, load_table

    osim = load_shadow(
        "mysql_syncer_spark/operators/similarity.py", "similarity_shadow16"
    )
    odedup = load_shadow(
        "mysql_syncer_spark/operators/dedup.py", "dedup_shadow16"
    )
    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("w16-equiv")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # literal-level identity: 0D vs F.lit(0.0)
    r = spark.range(1).select(
        F.expr("0D").alias("a"), F.lit(0.0).alias("b")
    ).selectExpr("typeof(a) ta", "typeof(b) tb", "a <=> b eq").first()
    assert (r["ta"], r["tb"], r["eq"]) == ("double", "double", True), r

    emb = load_table(spark, SF_DIR, "embeddings")
    sub = emb.where(F.col("vec_id") < 500)
    queries = emb.where(F.col("vec_id") % 500 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )

    same(
        osim.cosine_topk_batch(sub, queries),
        nsim.cosine_topk_batch(sub, queries),
        "cosine_topk_batch",
    )
    same(
        osim.cosine_topk_batch_lsh(sub, queries),
        nsim.cosine_topk_batch_lsh(sub, queries),
        "cosine_topk_batch_lsh",
    )
    same(
        osim.with_sign_buckets(sub),
        nsim.with_sign_buckets(sub),
        "with_sign_buckets",
    )
    for block in ("lsh", False):
        same(
            osim.knn_graph(sub, k=5, block=block),
            nsim.knn_graph(sub, k=5, block=block),
            f"knn_graph[block={block}]",
        )
    same(
        odedup.embedding_near_dups(emb, threshold=0.93),
        ndedup.embedding_near_dups(emb, threshold=0.93),
        "embedding_near_dups[label-block]",
    )
    same(
        odedup.embedding_near_dups(emb, block_col=None, threshold=0.93),
        ndedup.embedding_near_dups(emb, block_col=None, threshold=0.93),
        "embedding_near_dups[lsh-block]",
    )
    same(
        osim.pagerank(
            osim.knn_graph(sub, k=5, block=False).select("id_a", "id_b"),
            sub.select(F.col("vec_id").alias("id")),
            iters=3,
        ),
        nsim.pagerank(
            nsim.knn_graph(sub, k=5, block=False).select("id_a", "id_b"),
            sub.select(F.col("vec_id").alias("id")),
            iters=3,
        ),
        "pagerank-over-knn",
    )
    print("ALL EQUIVALENT", flush=True)


if __name__ == "__main__":
    main()
