"""Session timezone pinning (VERDICT r9 item 4).

The reference pins the entire PHP process to UTC before touching either
database (bootstrap.php:9-11; README.md "Timestamps Issue") because the
master/slave digest comparison breaks if the two ends render timestamps
in different zones. The Spark engine has the same exposure one level
down: a Spark TIMESTAMP is an instant, and every string rendering of it
— canon.py's row-hash canonicalization, digest GROUP_CONCAT bodies, and
the values the driver's oracle comparison hashes — goes through
``spark.sql.session.timeZone``. Two engine installations with different
host default TZs would therefore compute different row hashes for
identical data (the oracle parity sweep can't catch it: both engines run
on the same host).

These tests simulate the non-UTC host: flip the session TZ to a
DST-observing zone, and prove (a) ``load_table`` re-pins UTC for
driver-built sessions, (b) ``configure_session`` pins it at build time,
and (c) row hashes and table digests over real timestamp data are
bit-identical to the UTC ones — i.e. there is no code path left where
the ambient TZ can reach a hash.
"""

from pyspark.sql import functions as F

from mysql_syncer_spark.canon import with_row_hash
from mysql_syncer_spark.digest import table_digest
from mysql_syncer_spark.sources.catalog import configure_session, load_table

NON_UTC = "America/New_York"
TZ_KEY = "spark.sql.session.timeZone"


def _orders_digest(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    return table_digest(df)


def _events_hash_sum(spark, sf_dir):
    # events carries the (nanos-sourced) timestamp column — the column
    # the reference's "Timestamps Issue" is about
    df = load_table(spark, sf_dir, "events")
    hashed = with_row_hash(df, ["event_id"])
    return hashed.agg(
        F.sum(F.conv(F.substring("__row_hash", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def test_configure_session_pins_utc():
    from pyspark.sql import SparkSession

    b = configure_session(SparkSession.builder)
    assert b._options.get(TZ_KEY) == "UTC"


def test_load_table_repins_utc(spark, sf_dir):
    orig = spark.conf.get(TZ_KEY)
    try:
        spark.conf.set(TZ_KEY, NON_UTC)
        load_table(spark, sf_dir, "orders")
        assert spark.conf.get(TZ_KEY) == "UTC"
    finally:
        spark.conf.set(TZ_KEY, orig)


def test_digest_and_row_hashes_tz_invariant(spark, sf_dir):
    orig = spark.conf.get(TZ_KEY)
    try:
        spark.conf.set(TZ_KEY, "UTC")
        d_utc = _orders_digest(spark, sf_dir)
        e_utc = _events_hash_sum(spark, sf_dir)

        # simulate an engine run on a non-UTC host: the ambient session
        # TZ is wrong until the engine touches a table
        spark.conf.set(TZ_KEY, NON_UTC)
        d_ny = _orders_digest(spark, sf_dir)
        e_ny = _events_hash_sum(spark, sf_dir)

        assert d_ny == d_utc
        assert e_ny.s == e_utc.s and e_ny.n == e_utc.n
    finally:
        spark.conf.set(TZ_KEY, orig)


def test_timestamp_rendering_would_diverge_without_pin(spark):
    """Control: the hazard is real — the same instant renders
    differently under the two zones, so an unpinned hash WOULD split."""
    df = spark.sql("SELECT TIMESTAMP '2024-06-01 12:00:00' AS ts")
    orig = spark.conf.get(TZ_KEY)
    try:
        spark.conf.set(TZ_KEY, "UTC")
        utc = df.select(F.col("ts").cast("string").alias("s")).collect()[0].s
        spark.conf.set(TZ_KEY, NON_UTC)
        ny = df.select(F.col("ts").cast("string").alias("s")).collect()[0].s
        assert utc != ny  # -04:00 in June: '12:00:00' vs '08:00:00'
    finally:
        spark.conf.set(TZ_KEY, orig)


def test_dbapi_rows_to_df_paths_agree_on_naive_datetimes(spark):
    """ADVICE r10 (medium): _rows_to_df's Arrow path pins naive DBAPI
    datetimes to UTC (to_arrow_schema carries tz=UTC) while the pickle
    fallback ran them through TimestampType.toInternal → time.mktime,
    i.e. HOST-LOCAL time — a silent, data-dependent 4h divergence on a
    non-UTC host, feeding row hashes. The fix normalizes naive
    datetimes to UTC-aware before BOTH paths; this test simulates the
    non-UTC host (TZ env + tzset) and asserts both paths produce the
    same instant, equal to the UTC interpretation."""
    import datetime as dt
    import os
    import time as _time

    from pyspark.sql import types as T

    from mysql_syncer_spark.sources.dbapi import DBAPICatalog

    cat = DBAPICatalog.__new__(DBAPICatalog)
    cat.spark = spark
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    rows = [(1, dt.datetime(2024, 6, 1, 12, 0, 0))]  # naive

    def render(df):
        # JVM-side string rendering under the pinned UTC session TZ —
        # the representation row hashes/digests actually consume
        # (Python-side collect() of a raw timestamp renders host-local
        # and is NOT on any hash path)
        return df.select(
            F.col("ts").cast("string").alias("s")
        ).collect()[0].s

    orig_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        arrow_s = render(cat._rows_to_df(rows, schema))

        # force the pickle fallback by making pyarrow unimportable
        # inside _rows_to_df's try block
        import builtins

        real_import = builtins.__import__

        def no_arrow(name, *a, **kw):
            if name == "pyarrow":
                raise ImportError("forced for test")
            return real_import(name, *a, **kw)

        builtins.__import__ = no_arrow
        try:
            pickle_s = render(cat._rows_to_df(rows, schema))
        finally:
            builtins.__import__ = real_import
    finally:
        if orig_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = orig_tz
        _time.tzset()

    assert arrow_s == pickle_s == "2024-06-01 12:00:00", (
        arrow_s, pickle_s,
    )
