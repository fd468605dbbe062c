"""Measure py4j chatter of DataFrame construction for selected keys.

Wraps py4j's ClientServerConnection.send_command with a timer; reports,
per registry key build:
  * n       — total py4j roundtrips
  * chat_s  — time in roundtrips < 100 ms (driver chatter)
  * wait_s  — time in roundtrips >= 100 ms (eager jobs / long JVM calls)
  * wall_s  — build wall time

    python3 plans/r13/py4j_meter.py <key> [...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

_STATS = {"n": 0, "chat": 0.0, "wait": 0.0}


def _install() -> None:
    from py4j import clientserver

    orig = clientserver.ClientServerConnection.send_command

    def timed(self, *a, **kw):
        t0 = time.time()
        out = orig(self, *a, **kw)
        dt = time.time() - t0
        _STATS["n"] += 1
        if dt < 0.1:
            _STATS["chat"] += dt
        else:
            _STATS["wait"] += dt
        return out

    clientserver.ClientServerConnection.send_command = timed


def main() -> None:
    _install()
    from pyspark.sql import SparkSession

    from mysql_syncer_spark import queries as registry
    from mysql_syncer_spark.sources.catalog import configure_session

    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("py4j-meter")
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
        force(qmap[name](spark, SF_DIR))  # warm: JIT + page cache
        best = None
        for _ in range(3):
            _STATS.update(n=0, chat=0.0, wait=0.0)
            t0 = time.time()
            qmap[name](spark, SF_DIR)
            wall = time.time() - t0
            rec = (wall, _STATS["n"], _STATS["chat"], _STATS["wait"])
            if best is None or rec[0] < best[0]:
                best = rec
        print(
            f"{name:42s} wall {best[0]:6.2f}  n {best[1]:6d}  "
            f"chat {best[2]:6.2f}  wait {best[3]:6.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
