"""FileCatalog: CSV/JSON directories as first-class sync databases."""

import os

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.executor import sync
from mysql_syncer_spark.sources.catalog import FileCatalog, load_table


def _write_pair(spark, sf_dir, tmp_path, fmt):
    """master/ and slave/ dirs in ``fmt`` with a perturbed orders."""
    mdir, sdir = str(tmp_path / "master"), str(tmp_path / "slave")
    os.makedirs(mdir), os.makedirs(sdir)
    ext = FileCatalog.FORMATS[fmt]
    opts = FileCatalog._DEFAULT_WRITE.get(fmt, {})
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    def put(df, dirname, name):
        (
            df.write.format(fmt)
            .options(**opts)
            .save(os.path.join(dirname, f"{name}{ext}"))
        )

    put(orders, mdir, "orders")
    put(nation, mdir, "nation")
    key = F.col("o_orderkey")
    perturbed = orders.where(key % 7 != 0).withColumn(
        "o_orderpriority",
        F.when(key % 5 == 0, F.lit("MUTATED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    put(perturbed, sdir, "orders")
    put(nation, sdir, "nation")
    return mdir, sdir


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_sync_converges_in_format(spark, sf_dir, tmp_path, fmt):
    mdir, sdir = _write_pair(spark, sf_dir, tmp_path, fmt)
    m = FileCatalog(spark, mdir, fmt=fmt)
    s = FileCatalog(spark, sdir, fmt=fmt)
    rep = sync(m, s)
    assert rep.ok, [r.error for r in rep.results if r.error]
    a = m.table("orders").df
    b = s.table("orders").df
    assert a.count() == b.count()
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    # second sync: the digest gate must short-circuit to noop
    rep2 = sync(m, s)
    assert rep2.summary()["noop"] == rep2.summary()["tables"]


def test_csv_catalog_introspection(spark, sf_dir, tmp_path):
    mdir, _ = _write_pair(spark, sf_dir, tmp_path, "csv")
    cat = FileCatalog(spark, mdir, fmt="csv")
    assert cat.table_names() == ["nation", "orders"]
    h = cat.table("orders")
    assert h.pk_cols == ("o_orderkey",)
    # header+inferSchema round-trip keeps the key numeric
    assert dict(h.df.dtypes)["o_orderkey"] in ("int", "bigint")


def test_write_table_staging_swap(spark, sf_dir, tmp_path):
    mdir, _ = _write_pair(spark, sf_dir, tmp_path, "csv")
    cat = FileCatalog(spark, mdir, fmt="csv")
    before = cat.table("nation").df
    n = before.count()
    # overwrite a table FROM its own lazy read: staging must protect it
    cat.write_table(before.where(F.col("n_nationkey") >= 0), "nation")
    cat.invalidate()
    assert cat.table("nation").df.count() == n
    assert not os.path.exists(cat.table_path("nation") + ".__staging__")


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        FileCatalog(spark, str(tmp_path), fmt="avro-nope")


def test_load_tables_reads_all_fixture_tables(spark):
    from mysql_syncer_spark.sources.catalog import (
        FIXTURE_TABLES,
        load_tables,
    )

    tables = load_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) == set(FIXTURE_TABLES)
    assert tables["orders"].count() > 0
    # the nanos-ts normalization applied to events
    assert dict(tables["events"].dtypes)["ts"].startswith("timestamp")
