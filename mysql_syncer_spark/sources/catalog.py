"""Catalogs — named collections of tables behind a connection.

Reference abstraction: DatabaseConnection wraps a mysqli handle, lists
tables via SHOW TABLES (cached, src/project/DatabaseConnection.php:48-64),
and discovers schema/PK per table at runtime (TableConnection.php:17-24,
:635-675). Nothing is declared by the user except the partition map and
ignore list — the engine mirrors that: introspect everything.

Two implementations:

* :class:`ParquetCatalog` — a directory of ``<table>.parquet`` files (the
  test fixtures and the scale path: on a cluster this is s3/hdfs parquet or
  any Spark catalog table). PKs come from a supplied map (parquet has no PK
  concept); defaults cover the fixture schema.
* :class:`JDBCCatalog` — a JDBC URL; table list from
  ``information_schema.tables``, PKs from ``information_schema
  .key_column_usage`` — the direct MySQL-compat mode. Import-gated: only
  exercised when a JDBC driver jar is on the Spark classpath.
"""

from __future__ import annotations

import os
import re
from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_syncer_spark.config import TableHandle

#: PKs of the driver fixture tables (FIXTURES.md §1) — parquet carries no
#: PK metadata, so parquet-mode catalogs take a pk map with these defaults.
DEFAULT_PKS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    # lineitem has NO unique key in the driver fixtures (at sf0.001 only
    # 4599 distinct (l_orderkey, l_linenumber) over 6000 rows; full rows
    # ARE distinct) — so it takes the reference's no-PK path
    # (COPY_TABLES_WITH_NO_PRIMARY, Synchronizer.php:213-222).
    "lineitem": (),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def filter_ignored(tables: Iterable[str], ignore_regexes: Sequence[str]) -> list[str]:
    """Drop table names matching any ignore regex — the reference's
    removeIgnoredTables (Synchronizer.php:300-320). Driver-side metadata
    op, not a DataFrame op."""
    pats = [re.compile(p) for p in ignore_regexes]
    return [t for t in tables if not any(p.search(t) for p in pats)]


class Catalog:
    """Abstract named-table source."""

    def table_names(self) -> list[str]:
        raise NotImplementedError

    def table(self, name: str) -> TableHandle:
        raise NotImplementedError

    def has_table(self, name: str) -> bool:
        return name in self.table_names()


class FileCatalog(Catalog):
    """A directory of ``<name>.<ext>`` files/dirs as a database, in any
    Spark file format (``parquet`` default, ``csv``/``json``/``orc``).

    Non-parquet formats are first-class sync targets: a CSV or JSONL
    drop directory syncs against a parquet master (or another CSV dir)
    through the same digest/diff/merge machinery — the catalog owns
    BOTH sides of the I/O contract (typed read options per format, and
    the staged atomic ``write_table`` swap the executor calls), so the
    executor never special-cases a format. CSV reads infer schema with
    headers by default (override via ``read_options`` for production:
    explicit schemas beat a double scan at 100 TB)."""

    FORMATS: dict[str, str] = {
        "parquet": ".parquet",
        "csv": ".csv",
        "json": ".json",
        "orc": ".orc",
    }
    _DEFAULT_READ: dict[str, dict] = {
        "csv": {"header": "true", "inferSchema": "true"},
    }
    _DEFAULT_WRITE: dict[str, dict] = {
        "csv": {"header": "true"},
    }

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        pk_map: Mapping[str, Sequence[str]] | None = None,
        partition_map: Mapping[str, str] | None = None,
        fmt: str = "parquet",
        read_options: Mapping[str, str] | None = None,
        write_options: Mapping[str, str] | None = None,
    ):
        if fmt not in self.FORMATS:
            raise ValueError(
                f"unsupported format {fmt!r}; one of {sorted(self.FORMATS)}"
            )
        self.spark = spark
        self.path = path
        self.fmt = fmt
        self.ext = self.FORMATS[fmt]
        self.read_options = dict(
            read_options
            if read_options is not None
            else self._DEFAULT_READ.get(fmt, {})
        )
        self.write_options = dict(
            write_options
            if write_options is not None
            else self._DEFAULT_WRITE.get(fmt, {})
        )
        self.pk_map = {k: tuple(v) for k, v in (pk_map or DEFAULT_PKS).items()}
        self.partition_map = dict(partition_map or {})
        self._names: list[str] | None = None  # cached like the reference
        # per-table DataFrame cache: planner + executor both resolve each
        # table (schema compare, digest gate, diff), and every
        # ``spark.read`` re-lists files and re-reads footers
        # (~30ms each) — measurable against the sub-second noop re-sync.
        # Invalidated together with the name list after any write.
        self._dfs: dict[str, DataFrame] = {}

    def table_names(self) -> list[str]:
        if self._names is None:
            self._names = sorted(
                f[: -len(self.ext)]
                for f in os.listdir(self.path)
                if f.endswith(self.ext)
            )
        return list(self._names)

    def invalidate(self) -> None:
        self._names = None
        self._dfs = {}

    def table_path(self, name: str) -> str:
        return os.path.join(self.path, f"{name}{self.ext}")

    def table(self, name: str) -> TableHandle:
        df = self._dfs.get(name)
        if df is None:
            df = (
                self.spark.read.format(self.fmt)
                .options(**self.read_options)
                .load(self.table_path(name))
            )
            self._dfs[name] = df
        return TableHandle(
            name=name,
            df=df,
            pk_cols=self.pk_map.get(name, ()),
            partition_col=self.partition_map.get(name),
        )

    def write_table(self, df: DataFrame, name: str) -> None:
        """Atomic-ish table replace: stage to ``<path>.__staging__``,
        then swap. Writing over the target directly would delete the
        input a lazy plan is still reading (executor discipline)."""
        path = self.table_path(name)
        tmp = path + ".__staging__"
        (
            df.write.format(self.fmt)
            .options(**self.write_options)
            .mode("overwrite")
            .save(tmp)
        )
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
        os.replace(tmp, path)


class ParquetCatalog(FileCatalog):
    """A directory of ``<name>.parquet`` files/dirs as a database (the
    original fixture/scale path; :class:`FileCatalog` with
    ``fmt='parquet'``)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        pk_map: Mapping[str, Sequence[str]] | None = None,
        partition_map: Mapping[str, str] | None = None,
    ):
        super().__init__(spark, path, pk_map, partition_map, fmt="parquet")


class JDBCCatalog(Catalog):
    """JDBC-backed catalog (MySQL-compat mode).

    Table list and PK discovery are pushed to information_schema — the
    JDBC equivalents of SHOW TABLES / SHOW INDEX
    (DatabaseConnection.php:48-64, TableConnection.php:635-656).
    Reads use partitionColumn/numPartitions so a 1000-executor cluster
    splits the scan server-side instead of the reference's single-threaded
    LIMIT/OFFSET walk (TableConnection.php:241-256).
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        database: str,
        properties: Mapping[str, str] | None = None,
        num_partitions: int = 32,
        partition_map: Mapping[str, str] | None = None,
        session_init: str | None = None,
    ):
        self.spark = spark
        self.url = url
        self.database = database
        self.props = dict(properties or {})
        if session_init:
            # reference startup queries: SET group_concat_max_len / SET
            # FOREIGN_KEY_CHECKS=0 (SynchronizerFactory.php:16-19)
            self.props["sessionInitStatement"] = session_init
        self.num_partitions = num_partitions
        self.partition_map = dict(partition_map or {})
        self._names: list[str] | None = None

    def _read_query(self, query: str) -> DataFrame:
        return self.spark.read.format("jdbc").options(
            url=self.url, query=query, **self.props
        ).load()

    def table_names(self) -> list[str]:
        if self._names is None:
            rows = self._read_query(
                "SELECT table_name FROM information_schema.tables "
                f"WHERE table_schema = '{self.database}'"
            ).collect()
            self._names = sorted(r[0] for r in rows)
        return list(self._names)

    def primary_key(self, name: str) -> tuple[str, ...]:
        rows = self._read_query(
            "SELECT column_name, ordinal_position FROM "
            "information_schema.key_column_usage "
            f"WHERE table_schema = '{self.database}' "
            f"AND table_name = '{name}' AND constraint_name = 'PRIMARY' "
            "ORDER BY ordinal_position"
        ).collect()
        return tuple(r[0] for r in rows)

    def table(self, name: str) -> TableHandle:
        pk = self.primary_key(name)
        reader = self.spark.read.format("jdbc").options(
            url=self.url, dbtable=f"{self.database}.{name}", **self.props
        )
        pcol = self.partition_map.get(name) or (pk[0] if len(pk) == 1 else None)
        if pcol is not None:
            # server-side split scan; bounds resolved lazily by Spark
            bounds = self._read_query(
                f"SELECT MIN({pcol}) lo, MAX({pcol}) hi "
                f"FROM {self.database}.{name}"
            ).first()
            if bounds and bounds["lo"] is not None:
                reader = reader.options(
                    partitionColumn=pcol,
                    lowerBound=str(bounds["lo"]),
                    upperBound=str(bounds["hi"]),
                    numPartitions=str(self.num_partitions),
                )
        return TableHandle(
            name=name,
            df=reader.load(),
            pk_cols=pk,
            partition_col=self.partition_map.get(name),
        )

    def hash_frame(
        self,
        name: str,
        columns: Sequence[str],
        pk_cols: Sequence[str] | None = None,
        partition_value: str | None = None,
    ) -> DataFrame:
        """``(pk..., __row_hash)`` computed server-side via
        :func:`mysql_hash_pushdown_query` — the minimal-egress hash map.
        Pair with ``digest.mysql_compat_row_hash_col`` on a non-JDBC
        side; two JDBCCatalog sides are directly comparable."""
        pk = tuple(pk_cols) if pk_cols else self.primary_key(name)
        if not pk:
            raise ValueError(f"table {name!r} has no primary key")
        pcol = self.partition_map.get(name) if partition_value is not None else None
        if partition_value is not None and pcol is None:
            raise ValueError(
                f"partition_value given but table {name!r} has no "
                "partition column configured"
            )
        return self._read_query(
            mysql_hash_pushdown_query(
                self.database, name, columns, pk,
                partition_col=pcol, partition_value=partition_value,
            )
        )


def mysql_hash_pushdown_query(
    database: str,
    table: str,
    columns: Sequence[str],
    pk_cols: Sequence[str],
    partition_col: str | None = None,
    partition_value: str | None = None,
) -> str:
    """Server-side row-hash query (SURVEY §4 row 2): compute
    ``MD5(CONCAT_WS('#', COALESCE(col,'NULL')...))`` INSIDE the source
    MySQL server so only ``(pk..., hash)`` crosses the wire — the
    reference's hash-map economics (TableConnection.php:46-51, :117-123)
    without its LIMIT/OFFSET walk (Spark's partitionColumn splits this
    query server-side instead). COALESCE is applied here unlike the
    reference's hash-map path — the NullColumnTest fix the reference
    only has in its digest path (SURVEY §2.6 F2).

    The returned hash matches ``digest.mysql_compat_row_hash_col`` on
    the Spark side (MySQL text-protocol rendering), so a pushdown side
    can be diffed against a parquet/DataFrame side hashed with the
    compat renderer. Worth it only when the source DB has spare CPU and
    the WAN is the bottleneck — the default remains plain scans hashed
    in executors.
    """
    wrapped = ", ".join(f"COALESCE(`{c}`, 'NULL')" for c in columns)
    pk = ", ".join(f"`{c}`" for c in pk_cols)
    where = ""
    if partition_col is not None:
        # partition values are data-derived: render through the same
        # escaped-literal path the sinks use (TableConnection.php
        # escapes with mysqli_escape_string before interpolating)
        from ..sinks.jdbc import sql_literal

        lit = sql_literal(partition_value, backslash_escapes=True)
        where = f" WHERE `{partition_col}`={lit}"
    return (
        f"SELECT {pk}, MD5(CONCAT_WS('#', {wrapped})) AS `__row_hash` "
        f"FROM `{database}`.`{table}`{where}"
    )


# ---------------------------------------------------------------------------
# Fixture loading helpers (driver testdata; TESTDATA.md)
# ---------------------------------------------------------------------------

FIXTURE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as long
#: (requires spark.sql.legacy.parquet.nanosAsLong=true); we convert to
#: microsecond timestamps with integer division (float division loses
#: precision: epoch-nanos exceed double's 53-bit mantissa).
_NANOS_TS_COLS = {"events": ("ts",)}


def configure_session(builder):
    """Apply the session configs the engine needs on any builder."""
    return (
        builder.config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing nanos-timestamp columns."""
    if name in _NANOS_TS_COLS:
        # runtime-settable SQL conf; the caller's session (e.g. the
        # driver's) may not have it — without it the events read throws
        # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in FIXTURE_TABLES}
