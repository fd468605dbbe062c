"""Isolate-time registry queries with the noop sink (guide §1.4).

Usage: python plans/r12/timeq.py name [name...]  [-n reps] [--sf DIR]
Prints per-query: each rep's seconds and the min.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--conf", action="append", default=[], help="extra k=v session confs (A/B lever testing)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mysql_syncer_spark import queries as registry
    from mysql_syncer_spark.sources.catalog import configure_session

    builder = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("timeq")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for kv in args.conf:
        k, _, v = kv.partition("=")
        builder = builder.config(k, v)
    spark = configure_session(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()

    # warm Arrow worker pool (bench.py does the same before timing)
    spark.range(0, int(args.cpus) * 1000, 1, int(args.cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.names:
        reps = []
        for _ in range(args.n):
            t0 = time.time()
            qmap[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(reps)} reps={reps}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
