"""DBAPI-backed catalog: live SQL databases without a JDBC driver jar.

The reference's core scenario is MySQL↔MySQL (DatabaseConnection.php:
21-40); the scale path for that here is :class:`~mysql_syncer_spark.
sources.catalog.JDBCCatalog` (partitioned server-side scans). This
module is the *jar-free* counterpart: any DBAPI connection factory
(sqlite3, MySQLdb, psycopg) becomes a syncable catalog, with reads
fetched through ONE driver-side connection into ``createDataFrame``.

That read shape is deliberate and documented: driver-side fetch is
correct at integration/smoke scale (and is what lets this sandbox run a
REAL perturb→sync→converged scenario against an on-disk SQL database —
see tests/test_dbapi_sync.py); it is NOT the 100 TB read path. Writes
have no such asymmetry — they go through the same distributed
``foreachPartition`` chunked-statement sinks (sinks/jdbc.py) the JDBC
mode uses, executors opening their own connections.

Introspection speaks the sqlite dialect by default (``sqlite_master`` +
``PRAGMA table_info``, the stand-ins for SHOW TABLES / SHOW INDEX,
DatabaseConnection.php:48-64, TableConnection.php:635-675); the two SQL
hooks are overridable for other engines.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from mysql_syncer_spark.config import TableHandle
from mysql_syncer_spark.sources.catalog import Catalog

#: declared-type prefix → Spark type (sqlite type affinity rules:
#: anything containing INT is an integer, etc. — matched on prefixes of
#: the upper-cased decltype). Timestamps are kept as strings: sqlite
#: stores them as TEXT, and hashing/diffing only needs both sides to
#: agree on the representation.
_DECL_PREFIXES: tuple[tuple[str, T.DataType], ...] = (
    ("BIGINT", T.LongType()),
    ("INT", T.LongType()),
    ("REAL", T.DoubleType()),
    ("DOUB", T.DoubleType()),
    ("FLOA", T.DoubleType()),
    ("NUMERIC", T.DoubleType()),
    ("DECIMAL", T.DoubleType()),
    ("BOOL", T.BooleanType()),
    ("CHAR", T.StringType()),
    ("VARCHAR", T.StringType()),
    ("TEXT", T.StringType()),
    ("CLOB", T.StringType()),
    ("DATETIME", T.StringType()),
    ("TIMESTAMP", T.StringType()),
    ("DATE", T.StringType()),
    ("BLOB", T.BinaryType()),
)


def _spark_type(decltype: str) -> T.DataType:
    d = (decltype or "").strip().upper()
    for prefix, t in _DECL_PREFIXES:
        if d.startswith(prefix):
            return t
    raise ValueError(
        f"unmapped SQL column type {decltype!r} — extend _DECL_PREFIXES "
        "or provide an explicit schema"
    )


class DBAPICatalog(Catalog):
    """A live SQL database as a catalog, via a DBAPI connection factory.

    ``connect_factory`` must be picklable if the catalog's tables are
    written through the distributed sinks (a module-level function or
    ``functools.partial`` over one — executors re-create connections).
    """

    def __init__(
        self,
        spark: SparkSession,
        connect_factory: Callable[[], object],
        pk_map: Mapping[str, Sequence[str]] | None = None,
        partition_map: Mapping[str, str] | None = None,
        quote: str = '"',
        backslash_escapes: bool = False,
    ):
        self.spark = spark
        self.connect_factory = connect_factory
        self.pk_map = {k: tuple(v) for k, v in (pk_map or {}).items()}
        self.partition_map = dict(partition_map or {})
        #: identifier quoting + escape dialect, forwarded to the sinks
        self.quote = quote
        self.backslash_escapes = backslash_escapes
        self._names: list[str] | None = None

    # -- introspection hooks (sqlite dialect; override per engine) ----

    def _list_tables_sql(self) -> str:
        return (
            "SELECT name FROM sqlite_master WHERE type = 'table' "
            "AND name NOT LIKE 'sqlite_%'"
        )

    def _table_info(self, conn, name: str) -> list[tuple[str, str, int]]:
        """[(column, decltype, pk_ordinal)] in table column order —
        pk_ordinal 0 means not part of the primary key."""
        rows = conn.execute(f'PRAGMA table_info("{name}")').fetchall()
        # PRAGMA table_info: (cid, name, type, notnull, dflt_value, pk)
        return [(r[1], r[2], r[5]) for r in rows]

    # -- Catalog interface --------------------------------------------

    def table_names(self) -> list[str]:
        if self._names is None:
            conn = self.connect_factory()
            try:
                rows = conn.execute(self._list_tables_sql()).fetchall()
            finally:
                conn.close()
            self._names = sorted(r[0] for r in rows)
        return list(self._names)

    def invalidate(self) -> None:
        self._names = None

    def table(self, name: str) -> TableHandle:
        conn = self.connect_factory()
        try:
            info = self._table_info(conn, name)
            if not info:
                raise ValueError(f"no such table: {name}")
            cols = [c for c, _, _ in info]
            schema = T.StructType(
                [T.StructField(c, _spark_type(d), True) for c, d, _ in info]
            )
            col_list = ", ".join(f'"{c}"' for c in cols)
            rows = conn.execute(
                f'SELECT {col_list} FROM "{name}"'
            ).fetchall()
        finally:
            conn.close()
        pk = self.pk_map.get(name)
        if pk is None:
            by_ord = sorted(
                ((o, c) for c, _, o in info if o > 0)
            )
            pk = tuple(c for _, c in by_ord)
        df = self.spark.createDataFrame(
            [tuple(r) for r in rows], schema
        )
        return TableHandle(
            name=name,
            df=df,
            pk_cols=tuple(pk),
            partition_col=self.partition_map.get(name),
        )

    # -- DDL helpers used by the executor -----------------------------

    def sql_type(self, t: T.DataType) -> str:
        """Spark type → portable column type for CREATE TABLE."""
        if isinstance(t, T.LongType):
            return "BIGINT"
        if isinstance(t, (T.IntegerType, T.ShortType, T.ByteType)):
            return "INTEGER"
        if isinstance(t, T.DoubleType):
            return "DOUBLE PRECISION"
        if isinstance(t, T.FloatType):
            return "REAL"
        if isinstance(t, T.BooleanType):
            return "BOOLEAN"
        if isinstance(t, T.DecimalType):
            return f"NUMERIC({t.precision},{t.scale})"
        if isinstance(t, (T.TimestampType, T.DateType)):
            return "TIMESTAMP" if isinstance(t, T.TimestampType) else "DATE"
        if isinstance(t, T.BinaryType):
            return "BLOB"
        if isinstance(t, T.StringType):
            return "TEXT"
        raise ValueError(f"no SQL DDL mapping for Spark type {t}")

    def create_table_sql(
        self, name: str, schema: T.StructType, pk_cols: Sequence[str]
    ) -> str:
        q = self.quote
        cols = ", ".join(
            f"{q}{f.name}{q} {self.sql_type(f.dataType)}"
            for f in schema.fields
        )
        pk = (
            ", PRIMARY KEY (" + ", ".join(f"{q}{c}{q}" for c in pk_cols) + ")"
            if pk_cols
            else ""
        )
        return f"CREATE TABLE {q}{name}{q} ({cols}{pk})"
