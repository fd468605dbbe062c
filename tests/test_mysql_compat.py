"""MySQL ordered-digest compat mode goldens.

The expected hex strings below are PRECOMPUTED from MySQL's documented
semantics (MD5 of the ','-joined per-row
MD5(CONCAT_WS('#', COALESCE(col,'NULL')...)) in PK order, text-protocol
value rendering) by an independent pure-hashlib forward implementation —
they are literals, not recomputed at test time, so a semantics drift in
the engine cannot silently update them. Reference queries:
TableConnection.php:483-486 (table), :529-532 (partition variant whose
ORDER BY the compat mode moves inside the aggregate — see
digest.table_digest_mysql_compat docstring).
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_syncer_spark.digest import (
    mysql_digest_query,
    table_digest_mysql_compat,
)

A_DIGEST = "d8c59e91382308d965e0d7ce7f9d14a7"
B_DIGEST = "497e704d6de59e5c0df2bc280883e416"
C_DIGEST = "cc7b341cbec89dc8fdbe08414242b074"
D_DIGEST = "1ef84c4f56afac21544fa9cc186ccc7f"

NULLTEST_SCHEMA = "id INT, a INT, b INT, c INT"


def test_null_column_layouts_differ(spark):
    """The NullColumnTest regression (TableConnection.php:473-477):
    [2,null,null] and [null,2,null] must digest DIFFERENTLY."""
    a = spark.createDataFrame(
        [(1, 2, None, None), (2, None, 2, None), (3, 0, 0, 0)],
        NULLTEST_SCHEMA,
    )
    b = spark.createDataFrame(
        [(1, None, 2, None), (2, 2, None, None), (3, 0, 0, 0)],
        NULLTEST_SCHEMA,
    )
    da = table_digest_mysql_compat(a, ["id"])
    db = table_digest_mysql_compat(b, ["id"])
    assert da == A_DIGEST
    assert db == B_DIGEST
    assert da != db


def test_typed_columns_golden(spark):
    """DECIMAL scale padding, DATE/DATETIME(0) rendering, TINYINT(1)
    booleans, NULLs, and a '#' inside a string value."""
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DecimalType(10, 2)),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("flag", T.BooleanType()),
    ])
    import decimal
    rows = [
        (1, "alice", decimal.Decimal("12.50"),
         datetime.date(2024, 1, 31),
         datetime.datetime(2024, 1, 31, 23, 59, 59), True),
        (2, None, decimal.Decimal("0.00"), None,
         datetime.datetime(2020, 2, 29, 0, 0, 0), False),
        (3, "bob#x", None, datetime.date(1999, 12, 31), None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    assert table_digest_mysql_compat(df, ["id"]) == C_DIGEST


def test_composite_pk_ordering(spark):
    """Rows are ordered by the FULL composite PK regardless of input
    order/partitioning."""
    rows = [(2, 1, "z"), (1, 2, "y"), (1, 1, "x")]  # shuffled
    df = spark.createDataFrame(rows, "g INT, k INT, v STRING")
    assert table_digest_mysql_compat(
        df.repartition(4), ["g", "k"]
    ) == D_DIGEST


def test_input_order_irrelevant(spark):
    a = spark.createDataFrame(
        [(3, 0, 0, 0), (1, 2, None, None), (2, None, 2, None)],
        NULLTEST_SCHEMA,
    ).repartition(5)
    assert table_digest_mysql_compat(a, ["id"]) == A_DIGEST


def test_empty_table_is_null(spark):
    """GROUP_CONCAT over zero rows is SQL NULL -> MD5(NULL) = NULL."""
    df = spark.createDataFrame([], NULLTEST_SCHEMA)
    assert table_digest_mysql_compat(df, ["id"]) is None


def test_unsupported_types_refused(spark):
    df = spark.createDataFrame([(1, 1.5)], "id INT, x DOUBLE")
    with pytest.raises(ValueError, match="MySQL text rendering"):
        table_digest_mysql_compat(df, ["id"])


def test_mysql_digest_query_text():
    """The live-server companion SQL: deterministic ordered form."""
    q = mysql_digest_query("t", ["id", "a"], ["id"])
    assert q == (
        "SELECT MD5(GROUP_CONCAT(MD5(CONCAT_WS('#', "
        "COALESCE(`id`, 'NULL'), COALESCE(`a`, 'NULL'))) "
        "ORDER BY `id` SEPARATOR ',')) AS `hash` FROM `t`"
    )
    qp = mysql_digest_query(
        "t", ["id", "a"], ["id"],
        partition_col="p", partition_value="5",
    )
    assert qp.endswith("FROM `t` WHERE `p`='5'")
