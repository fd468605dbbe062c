"""Interleaved A/B for the wave-15 periodic-lineage-cut loops:
old (per-round eager pin, from git HEAD) vs new (lazy chain) pagerank
and propagate_scores, alternating order per pair in ONE JVM.

Also asserts output equality (exceptAll both ways) on the first pair.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def load_shadow() -> object:
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         "HEAD:mysql_syncer_spark/operators/similarity.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/similarity_shadow.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("similarity_shadow", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["similarity_shadow"] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators import similarity as new
    from mysql_syncer_spark.sources.catalog import configure_session, load_table

    old = load_shadow()
    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("w15-loop-ab")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    force = lambda df: df.write.format("noop").mode("overwrite").save()

    emb = load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 500)
    edges = new.knn_graph(emb, k=5, block=False).select("id_a", "id_b")
    edges = edges.localCheckpoint(eager=True)  # shared input: time LOOPS only
    nodes = emb.select(F.col("vec_id").alias("id")).localCheckpoint(eager=True)
    seeds = emb.select(
        F.col("vec_id").alias("id"),
        (F.pmod(F.col("vec_id") * 2654435761, F.lit(1000)) * 1000)
        .cast("long")
        .alias("score_micro"),
    ).localCheckpoint(eager=True)

    # equality proof
    a = old.pagerank(edges, nodes, iters=3)
    b = new.pagerank(edges, nodes, iters=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = old.propagate_scores(edges, seeds, iters=3)
    d = new.propagate_scores(edges, seeds, iters=3)
    assert c.exceptAll(d).count() == 0 and d.exceptAll(c).count() == 0
    print("outputs identical", flush=True)

    def t(fn):
        t0 = time.time()
        force(fn())
        return time.time() - t0

    for label, ofn, nfn in (
        ("pagerank", lambda: old.pagerank(edges, nodes, iters=3),
         lambda: new.pagerank(edges, nodes, iters=3)),
        ("propagate", lambda: old.propagate_scores(edges, seeds, iters=3),
         lambda: new.propagate_scores(edges, seeds, iters=3)),
    ):
        olds, news = [], []
        for rep in range(4):
            if rep % 2 == 0:
                olds.append(t(ofn)); news.append(t(nfn))
            else:
                news.append(t(nfn)); olds.append(t(ofn))
        print(
            f"{label}: old {min(olds):.2f} (all {[round(x,2) for x in olds]})"
            f"  new {min(news):.2f} (all {[round(x,2) for x in news]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
