"""Capture .explain('formatted') for registry queries into
plans/r13/<query>_<tag>.txt  (tag = before/after).

Usage: python plans/r13/capture_plans.py <tag> [name ...]
With no names, captures every declared query. Plans are built (not
executed); queries whose *builders* run driver-side jobs (codebook
training, index builds) pay that cost once here.
"""

from __future__ import annotations

import os
import sys
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from mysql_syncer_spark import queries as registry
    from mysql_syncer_spark.sources.catalog import configure_session

    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("capture-plans")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "12g")
        )
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    if not names:
        names = list(qmap)
    for name in names:
        out = os.path.join(HERE, f"{name}_{tag}.txt")
        try:
            df = qmap[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"captured {name} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
