"""Wave-15 equivalence proof: the expr-rewritten dedup builders emit
byte-identical frames to the pre-wave implementation (loaded from git
HEAD as a shadow module) on the sf0.1 docs corpus."""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def load_shadow(ref: str = "HEAD") -> object:
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"{ref}:mysql_syncer_spark/operators/dedup.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/dedup_shadow.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("dedup_shadow", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["dedup_shadow"] = mod
    spec.loader.exec_module(mod)
    return mod


def same(a, b, label: str) -> None:
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    n1, n2 = a.count(), b.count()
    status = "OK " if (d1 == 0 and d2 == 0 and n1 == n2) else "FAIL"
    print(f"{status} {label}: rows {n1}/{n2}, diff {d1}/{d2}", flush=True)
    if status == "FAIL":
        sys.exit(1)


def main() -> None:
    from pyspark.sql import SparkSession

    from mysql_syncer_spark.operators import dedup as new
    from mysql_syncer_spark.sources.catalog import configure_session, load_table

    old = load_shadow()
    spark = (
        configure_session(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("w15-equiv")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    half = docs.where("doc_id % 2 = 0")
    rest = docs.where("doc_id % 2 = 1")

    for mode in ("md5", "xxhash64"):
        same(
            old.minhash_signatures(docs, hash_mode=mode),
            new.minhash_signatures(docs, hash_mode=mode),
            f"minhash_signatures[{mode}]",
        )
    sig_o = old.minhash_signatures(docs).localCheckpoint(eager=True)
    same(
        old.band_bucket_frame(sig_o, "doc_id", 32, 8),
        new.band_bucket_frame(sig_o, "doc_id", 32, 8),
        "band_bucket_frame",
    )
    same(
        old.minhash_lsh_pairs(docs),
        new.minhash_lsh_pairs(docs),
        "minhash_lsh_pairs",
    )
    same(
        old.minhash_lsh_pairs_between(half, rest),
        new.minhash_lsh_pairs_between(half, rest),
        "minhash_lsh_pairs_between",
    )
    same(
        old.incremental_new_docs(half, rest),
        new.incremental_new_docs(half, rest),
        "incremental_new_docs",
    )
    same(old.simhash(docs), new.simhash(docs), "simhash")
    sig = old.simhash(docs).localCheckpoint(eager=True)
    for mb in (1, 3):
        same(
            old.simhash_pairs_from_signatures(sig, max_bits=mb),
            new.simhash_pairs_from_signatures(sig, max_bits=mb),
            f"simhash_pairs_from_signatures[max_bits={mb}]",
        )
    print("ALL EQUIVALENT", flush=True)


if __name__ == "__main__":
    main()
