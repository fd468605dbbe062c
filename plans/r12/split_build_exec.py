"""Split per-key time into DataFrame BUILD (qmap[name](spark, sf)) vs
EXEC (noop sink) for a list of keys — the wave-14 diagnostic applied
to an arbitrary key set.  Usage:

    python3 plans/r12/split_build_exec.py key1 key2 ...

Prints one line per key: name, min build s, min exec s over 3 reps.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    from mysql_syncer_spark import queries as registry
    from mysql_syncer_spark.sources.catalog import configure_session

    keys = sys.argv[1:]
    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("split-build-exec")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.driver.memory", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    force = lambda df: df.write.format("noop").mode("overwrite").save()
    force(
        spark.range(0, int(CPUS) * 1000, 1, int(CPUS)).mapInPandas(
            lambda it: it, "id long"
        )
    )
    for name in keys:
        builds, execs = [], []
        for _ in range(3):
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            t1 = time.time()
            force(df)
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"{name:45s} build {min(builds):6.2f}  exec {min(execs):6.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
