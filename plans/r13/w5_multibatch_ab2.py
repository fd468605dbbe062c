"""Interleaved A/B on a quiet host: r12 multibatch shape (eager
between-fold pin, full re-hash per fold) vs r13 (keep_hash carry +
lazy between-fold pin). Plus scd2_orders as the unchanged control."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from mysql_syncer_spark import queries as registry
from mysql_syncer_spark.queries._part1 import _slave_orders, _slave_orders2
from mysql_syncer_spark.scd import scd2_apply, scd2_init
from mysql_syncer_spark.sources.catalog import configure_session, load_table

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6

spark = (
    configure_session(
        SparkSession.builder.master("local[32]")
        .appName("w5-ab2")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
    ).getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def build_r12():
    orders = load_table(spark, SF, "orders")
    hist = scd2_init(orders, 0)
    hist = scd2_apply(
        hist, _slave_orders(orders), ["o_orderkey"], 1
    ).localCheckpoint(eager=True)
    return scd2_apply(hist, _slave_orders2(orders), ["o_orderkey"], 2)


qmap = registry.queries()
build_r13 = lambda: qmap["scd2_multibatch_orders"](spark, SF)
control = lambda: qmap["scd2_orders"](spark, SF)

force(spark.range(0, 32_000, 1, 32).mapInPandas(lambda it: it, "id long"))
force(build_r12())
force(build_r13())
force(control())

res = {"A_r12": [], "B_r13": [], "ctl": []}
for rep in range(REPS):
    order = (
        [("A_r12", build_r12), ("B_r13", build_r13)]
        if rep % 2 == 0
        else [("B_r13", build_r13), ("A_r12", build_r12)]
    )
    for name, builder in order:
        t0 = time.time()
        force(builder())
        res[name].append(round(time.time() - t0, 3))
    t0 = time.time()
    force(control())
    res["ctl"].append(round(time.time() - t0, 3))

for k, v in res.items():
    print(k, "min", min(v), v)
spark.stop()
