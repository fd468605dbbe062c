"""cProfile a key's DataFrame BUILD phase: splits the wall into
eager-materialization wait (localCheckpoint / count / collect cumtime)
vs everything else (py4j plan-construction chatter + Python work).

    python3 plans/r12/profile_build.py <key> [<key> ...]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    from mysql_syncer_spark import queries as registry
    from mysql_syncer_spark.sources.catalog import configure_session

    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("profile-build")
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
    for name in sys.argv[1:]:
        # warm pass (JIT, page cache) so the profile shows steady state
        force(qmap[name](spark, SF_DIR))
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        df = qmap[name](spark, SF_DIR)
        pr.disable()
        wall = time.time() - t0
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        st.print_stats(25)
        txt = s.getvalue()
        print(f"===== {name}  build wall {wall:.2f}s =====")
        # pull the headline rows we care about
        for line in txt.splitlines():
            if any(
                p in line
                for p in (
                    "localCheckpoint",
                    "send_command",
                    "recv",
                    "ncalls",
                    "function calls",
                )
            ):
                print(line)
        print("--- top 25 cumulative ---")
        print("\n".join(txt.splitlines()[:40]))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
