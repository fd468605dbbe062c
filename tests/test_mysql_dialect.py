"""MySQL statement-dialect golden suite — byte-exact statements for a
MySQL target, no live server needed.

Covers every statement shape the DBAPI sync executor can emit against a
MySQL slave: multi-row INSERT with NULL/quote/backslash payloads
(TableConnection.php:289-360), composite-key tuple-IN DELETE (:367-387),
delete-before-insert REPLACE ordering (:599-627), session-init startup
statements on every connection (SynchronizerFactory.php:16-19,
DatabaseConnection.php:31-39), and CREATE TABLE emission for a
non-MySQL master. The recorded-connection tests run the REAL
distributed sink path (foreachPartition from executor workers).
"""

import datetime

import pytest
from pyspark.sql import types as T

from mysql_syncer_spark.sinks.jdbc import (
    apply_replace,
    delete_sql,
    insert_sql,
    sql_literal,
)
from mysql_syncer_spark.sources.dbapi import (
    MYSQL_SESSION_INIT,
    MySQLCatalog,
    _InitFactory,
)


# ---------------------------------------------------------------------
# pure statement goldens
# ---------------------------------------------------------------------

def test_insert_golden_null_quote_backslash():
    rows = [
        (1, "plain", 2.5),
        (2, "it's", None),
        (3, "a\\b", 0.0),
        (4, None, -1.25),
    ]
    got = insert_sql(
        "orders", ["id", "note", "amt"], rows,
        quote="`", backslash_escapes=True,
    )
    assert got == (
        "INSERT INTO `orders` (`id`, `note`, `amt`) VALUES "
        "(1, 'plain', 2.5),"
        "(2, 'it''s', NULL),"
        "(3, 'a\\\\b', 0.0),"
        "(4, NULL, -1.25)"
    )


def test_delete_golden_composite_tuple_in():
    got = delete_sql(
        "orders", ["g", "k"],
        [(1, "x"), (2, "o'k"), (3, None)],
        quote="`", backslash_escapes=True,
    )
    assert got == (
        "DELETE FROM `orders` WHERE (`g`, `k`) IN "
        "((1, 'x'),(2, 'o''k'),(3, NULL))"
    )


def test_literal_goldens():
    # MySQL-mode escaping: backslashes doubled (sql_mode interprets
    # them), quotes doubled (standard), NULL bare, bools as TINYINT
    assert sql_literal(None, True) == "NULL"
    assert sql_literal(True, True) == "1"
    assert sql_literal(False, True) == "0"
    assert sql_literal("C:\\tmp\\x", True) == "'C:\\\\tmp\\\\x'"
    assert sql_literal("O'Brien", True) == "'O''Brien'"
    assert sql_literal(
        datetime.datetime(2024, 1, 31, 23, 59, 59), True
    ) == "'2024-01-31 23:59:59'"
    assert sql_literal(datetime.date(2024, 1, 31), True) == "'2024-01-31'"
    # ANSI mode must NOT double backslashes (would corrupt the value)
    assert sql_literal("a\\b", False) == "'a\\b'"


def test_create_table_golden(spark):
    cat = MySQLCatalog(spark, lambda: None)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DecimalType(10, 2)),
        T.StructField("ok", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("body", T.StringType()),
    ])
    got = cat.create_table_sql("t", schema, ["id", "name"])
    assert got == (
        "CREATE TABLE `t` (`id` BIGINT, `name` VARCHAR(255), "
        "`amt` DECIMAL(10,2), `ok` TINYINT(1), `ts` DATETIME, "
        "`body` TEXT, PRIMARY KEY (`id`, `name`)) "
        "ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
    )


def test_mysql_type_mapping():
    m = MySQLCatalog._spark_type_mysql
    assert isinstance(m("int(11)"), T.LongType)
    assert isinstance(m("bigint(20)"), T.LongType)
    # BIGINT UNSIGNED spans [0, 2^64): >= 2^63 overflows signed long —
    # mapped to the exact 20-digit decimal instead
    bu = m("bigint(20) unsigned")
    assert isinstance(bu, T.DecimalType)
    assert (bu.precision, bu.scale) == (20, 0)
    assert isinstance(m("int(10) unsigned"), T.LongType)  # fits w/ headroom
    assert isinstance(m("tinyint(1)"), T.BooleanType)
    assert isinstance(m("tinyint(4)"), T.LongType)
    assert isinstance(m("varchar(255)"), T.StringType)
    assert isinstance(m("decimal(10,2)"), T.StringType)  # exact digits
    assert isinstance(m("datetime"), T.StringType)
    assert isinstance(m("enum('a','b')"), T.StringType)
    assert isinstance(m("longblob"), T.BinaryType)
    with pytest.raises(ValueError, match="unmapped"):
        m("geometry")


def test_session_init_default_is_reference_startup():
    assert MYSQL_SESSION_INIT == (
        "SET group_concat_max_len = 18446744073709547520",
        "SET FOREIGN_KEY_CHECKS=0",
    )


# ---------------------------------------------------------------------
# recorded-connection goldens: REPLACE ordering + session init through
# the real distributed sink path
# ---------------------------------------------------------------------

def _recording_factory(path, statements=()):
    """Factory whose connections append every executed statement to
    ``path`` — defined as a closure so cloudpickle ships it by value to
    executor workers."""

    def factory():
        class Cur:
            def execute(self, sql):
                with open(path, "a") as f:
                    f.write(sql + "\n\x1e\n")

        class Conn:
            def cursor(self):
                return Cur()

            def commit(self):
                pass

            def close(self):
                pass

        return Conn()

    if statements:
        return _InitFactory(factory, statements)
    return factory


def _recorded(path):
    with open(path) as f:
        return [s for s in f.read().split("\n\x1e\n") if s]


def test_replace_orders_delete_before_insert(spark, tmp_path):
    """apply_replace against a MySQL-dialect target: per chunk, the
    tuple-IN DELETE of the incoming PKs executes BEFORE the multi-row
    INSERT (the partition-move guard, Synchronizer.php:496-517)."""
    log = str(tmp_path / "sql.log")
    rows = spark.createDataFrame(
        [(1, "new'"), (2, "v\\2")], "id INT, v STRING"
    ).coalesce(1)
    apply_replace(
        rows, "t", ["id"], _recording_factory(log),
        quote="`", backslash_escapes=True,
    )
    stmts = _recorded(log)
    assert stmts == [
        "DELETE FROM `t` WHERE (`id`) IN ((1),(2))",
        "INSERT INTO `t` (`id`, `v`) VALUES (1, 'new'''),(2, 'v\\\\2')",
    ]


def test_session_init_runs_on_every_connection(spark, tmp_path):
    """The reference's startup queries run at the top of EVERY
    connection — driver-side and executor-side alike."""
    log = str(tmp_path / "sql.log")
    factory = _recording_factory(log, MYSQL_SESSION_INIT)
    rows = spark.createDataFrame(
        [(1, "a")], "id INT, v STRING"
    ).coalesce(1)
    apply_replace(rows, "t", ["id"], factory,
                  quote="`", backslash_escapes=True)
    stmts = _recorded(log)
    assert stmts[0] == "SET group_concat_max_len = 18446744073709547520"
    assert stmts[1] == "SET FOREIGN_KEY_CHECKS=0"
    assert stmts[2].startswith("DELETE FROM `t` ")
    assert stmts[3].startswith("INSERT INTO `t` ")


# ---------------------------------------------------------------------
# server-side hash pushdown (SURVEY §4 row 2)
# ---------------------------------------------------------------------

def test_hash_pushdown_query_golden():
    from mysql_syncer_spark.sources.catalog import mysql_hash_pushdown_query

    q = mysql_hash_pushdown_query("db", "orders", ["id", "note"], ["id"])
    assert q == (
        "SELECT `id`, MD5(CONCAT_WS('#', COALESCE(`id`, 'NULL'), "
        "COALESCE(`note`, 'NULL'))) AS `__row_hash` "
        "FROM `db`.`orders`"
    )
    qp = mysql_hash_pushdown_query(
        "db", "orders", ["id", "note"], ["id"],
        partition_col="p", partition_value="5",
    )
    assert qp.endswith("FROM `db`.`orders` WHERE `p`='5'")


def test_hash_pushdown_matches_spark_compat_hash(spark):
    """The server-computed MD5 must equal digest.mysql_compat_row_hash_col
    for the same logical rows, or pushdown/non-pushdown sides could
    never be diffed. Simulated server side: pure-hashlib forward
    implementation of MySQL's documented CONCAT_WS/MD5 semantics."""
    import hashlib

    from pyspark.sql import functions as F

    from mysql_syncer_spark.digest import mysql_compat_row_hash_col

    rows = [(1, "alice", None), (2, None, 7), (3, "x#y", 0)]
    df = spark.createDataFrame(rows, "id INT, name STRING, n INT")
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", mysql_compat_row_hash_col(df).alias("h")
        ).collect()
    }
    for row in rows:
        payload = "#".join(
            "NULL" if v is None else str(v) for v in row
        )
        assert got[row[0]] == hashlib.md5(payload.encode()).hexdigest()


def test_partition_value_escaped_in_emitted_sql():
    """Partition values are data-derived: quotes/backslashes must be
    escaped (mysqli_escape_string in the reference), never raw-
    interpolated — otherwise a value like "O'Brien" breaks the query
    and a crafted value injects SQL."""
    from mysql_syncer_spark.digest import mysql_digest_query
    from mysql_syncer_spark.sources.catalog import mysql_hash_pushdown_query

    hostile = "x'; DROP TABLE t; --"
    q = mysql_hash_pushdown_query(
        "db", "t", ["id"], ["id"],
        partition_col="p", partition_value=hostile,
    )
    assert q.endswith("WHERE `p`='x''; DROP TABLE t; --'")
    d = mysql_digest_query(
        "t", ["id"], ["id"], partition_col="p", partition_value=hostile,
    )
    assert d.endswith("WHERE `p`='x''; DROP TABLE t; --'")
    # backslashes doubled for MySQL's default sql_mode
    qb = mysql_digest_query(
        "t", ["id"], ["id"], partition_col="p", partition_value="a\\b",
    )
    assert qb.endswith("WHERE `p`='a\\\\b'")
    # non-string partition values render as bare literals
    qn = mysql_hash_pushdown_query(
        "db", "t", ["id"], ["id"], partition_col="p", partition_value=5,
    )
    assert qn.endswith("WHERE `p`=5")


def test_mysql_catalog_hash_pushdown_sql_golden():
    """MySQLCatalog emits the reference's native server-side hash
    (TableConnection.php:46-51) with the COALESCE NULL fix."""
    cat = MySQLCatalog.__new__(MySQLCatalog)  # SQL emission needs no conn
    q = MySQLCatalog.hash_pushdown_sql(cat, "orders", ["id", "note"], ["id"])
    assert q == (
        "SELECT `id`, MD5(CONCAT_WS('#', COALESCE(`id`, 'NULL'), "
        "COALESCE(`note`, 'NULL'))) AS `__row_hash` "
        "FROM `orders`"
    )
