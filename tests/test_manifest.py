"""File-level min/max manifest pruning (sources/manifest.py)."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.sources.layout import write_zordered
from mysql_syncer_spark.sources.manifest import (
    build_manifest,
    pruned_read,
    write_manifest,
)


@pytest.fixture(scope="module")
def laid_out(spark, sf_dir, tmp_path_factory):
    """orders z-ordered on the pruning column into 16 files + manifest."""
    path = str(tmp_path_factory.mktemp("manifest") / "orders_z")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_zordered(
        orders, path, ["o_custkey", "o_totalprice"], num_files=16
    )
    write_manifest(spark, path, ["o_custkey", "o_totalprice"])
    return path, orders


def test_manifest_shape(spark, laid_out):
    path, orders = laid_out
    man = build_manifest(spark, path, ["o_custkey"])
    assert man.count() == 16
    assert man.agg(F.sum("n_rows")).first()[0] == orders.count()
    row = man.first()
    assert row["o_custkey_min"] <= row["o_custkey_max"]


def test_pruned_read_correct_and_skips_files(spark, laid_out):
    path, orders = laid_out
    lo, hi = 100, 200
    df, read, total = pruned_read(spark, path, "o_custkey", lo, hi)
    got = df.where(F.col("o_custkey").between(lo, hi))
    want = orders.where(F.col("o_custkey").between(lo, hi))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # z-order narrowed per-file custkey ranges -> most files skip
    assert total == 16
    assert read < total, (read, total)


def test_pruned_read_empty_range(spark, laid_out):
    path, orders = laid_out
    df, read, total = pruned_read(spark, path, "o_custkey", -50, -10)
    assert df.count() == 0 and read == 0 and total == 16
    # schema preserved for downstream composition
    assert df.columns == orders.columns


def test_manifest_validation(spark, laid_out):
    path, _ = laid_out
    with pytest.raises(ValueError):
        build_manifest(spark, path, [])
