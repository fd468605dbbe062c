"""Interleaved A/B: scd2 eager classify/history pins (HEAD) vs lazy
(eager=False) pins — fewer blocking driver jobs, same values.

Usage: python plans/r13/w5_scd2_ab.py [sf_dir] [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import mysql_syncer_spark.pin as pin_mod
import mysql_syncer_spark.scd as scd_mod
import mysql_syncer_spark.queries._part1 as p1
from mysql_syncer_spark import queries as registry
from mysql_syncer_spark.sources.catalog import configure_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = (
    configure_session(
        SparkSession.builder.master("local[32]")
        .appName("w5-scd2-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
    ).getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

real_pin = pin_mod.pin


def lazy_pin(df, eager=True, required=False):
    return real_pin(df, eager=False, required=required)


def force(df):
    df.write.format("noop").mode("overwrite").save()


qmap = registry.queries()
KEYS = ["scd2_orders", "scd2_multibatch_orders", "scd2_lookup_lineitem"]

# warmup
force(spark.range(0, 32_000, 1, 32).mapInPandas(lambda it: it, "id long"))
for k in KEYS:
    force(qmap[k](spark, SF))

results = {k: {"A": [], "B": []} for k in KEYS}
for rep in range(REPS):
    for variant in ("A", "B") if rep % 2 == 0 else ("B", "A"):
        scd_mod.pin = real_pin if variant == "A" else lazy_pin
        p1.pin = real_pin if variant == "A" else lazy_pin
        for k in KEYS:
            t0 = time.time()
            force(qmap[k](spark, SF))
            results[k][variant].append(round(time.time() - t0, 3))

for k in KEYS:
    a, b = results[k]["A"], results[k]["B"]
    print(
        f"{k}: A(eager) min={min(a)} all={a}  "
        f"B(lazy) min={min(b)} all={b}"
    )

# equivalence: lazy variant byte-identical
scd_mod.pin = real_pin
p1.pin = real_pin
for k in KEYS:
    a_df = qmap[k](spark, SF)
    scd_mod.pin = lazy_pin
    p1.pin = lazy_pin
    b_df = qmap[k](spark, SF)
    scd_mod.pin = real_pin
    p1.pin = real_pin
    d1 = a_df.exceptAll(b_df).count()
    d2 = b_df.exceptAll(a_df).count()
    print(f"{k}: exceptAll A-B={d1} B-A={d2}")
    assert d1 == 0 and d2 == 0
print("EQUIV OK")
spark.stop()
