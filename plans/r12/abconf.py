"""Paired A/B of a runtime-settable SQL conf in ONE session.

For each query: alternate conf=off/on per rep (off,on,off,on,...),
report per-config min — both configs see the same JVM, same ambient
load, interleaved at rep granularity.

Usage: python plans/r12/abconf.py CONF_KEY OFF_VAL ON_VAL name... [-n pairs]
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
    ap.add_argument("conf_key")
    ap.add_argument("off_val")
    ap.add_argument("on_val")
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3, help="A/B pairs per query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mysql_syncer_spark import queries as registry
    from mysql_syncer_spark.sources.catalog import configure_session

    spark = configure_session(
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("abconf")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    spark.range(0, int(args.cpus) * 1000, 1, int(args.cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.names:
        offs, ons = [], []
        # one untimed warm rep (JIT/codegen) under OFF
        spark.conf.set(args.conf_key, args.off_val)
        qmap[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        for i in range(args.n):
            # alternate which config runs first per pair: the second
            # slot of a pair is systematically faster (warmer JIT /
            # caches) — measured r12: a no-op conf "won" 2-9% purely by
            # always running second
            pair = ((args.off_val, offs), (args.on_val, ons))
            if i % 2:
                pair = (pair[1], pair[0])
            for val, bucket in pair:
                spark.conf.set(args.conf_key, val)
                t0 = time.time()
                qmap[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                bucket.append(round(time.time() - t0, 3))
        print(
            f"{name}: off_min={min(offs)} on_min={min(ons)} "
            f"off={offs} on={ons}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
