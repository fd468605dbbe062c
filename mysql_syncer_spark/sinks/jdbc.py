"""JDBC-mode mutation sinks: chunked DELETE / multi-row INSERT batches.

Spark's DataFrame API has no DELETE pushdown for JDBC targets, so the
reference's write path (chunked ``DELETE ... WHERE (pk...) IN (...)``
and multi-row ``INSERT INTO ... VALUES (...),(...)`` —
src/project/TableConnection.php:289-387, chunk loop
Synchronizer.php:566-582) is reproduced here as ``foreachPartition``
batches over delta DataFrames:

* statement builders are pure functions (unit-tested without a DB);
* executors open their own DBAPI connections via an injected factory
  (a connection can't be pickled to workers) and commit per chunk —
  idempotent under retry because DELETE-by-PK and delete-before-insert
  replace (TableConnection.php:599-627 replaceRows) re-apply cleanly;
* ``chunk_size`` plays the reference's CHUNK_SIZE role
  (settings.php.tmpl:32-34): bounds statement size / packet size, NOT
  memory — partitions stream through ``itertools.islice``.

At 100 TB the delta frames are small by construction (only changed
rows), and the write parallelism equals the delta's partition count —
``df.repartition(n)`` upstream is the knob for target-DB write
concurrency.
"""

from __future__ import annotations

import itertools
import sys
from collections.abc import Callable, Iterable, Iterator, Sequence
from datetime import date, datetime, timezone
from decimal import Decimal

from pyspark.sql import DataFrame

DEFAULT_CHUNK_SIZE = 5000  # reference CHUNK_SIZE (settings.php.tmpl:34)

# The foreachPartition closures below reference this module's statement
# builders; by default cloudpickle ships module functions BY REFERENCE,
# which requires mysql_syncer_spark to be importable inside executor
# Python workers (--py-files). Registering the module for by-value
# pickling removes that deployment requirement for the sink path.
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older pyspark layouts
    pass


def sql_literal(v, backslash_escapes: bool = False) -> str:
    """NULL-aware SQL literal rendering — mirror of the reference's
    escaped-and-quoted value path (TableConnection.php:323-341).

    ``backslash_escapes=True`` doubles backslashes for MySQL's default
    sql_mode (which interprets them); ANSI engines (sqlite, postgres
    standard_conforming_strings, DuckDB) treat backslashes literally and
    only need quote doubling — escaping them there CORRUPTS the value.

    Wire-corner rules (golden-tested, tests/goldens/mysql_literals.json):
    ``Decimal`` renders UNQUOTED at its exact scale (a quoted decimal
    round-trips through string casting and can lose the column scale);
    ``bytes``/``bytearray`` render as ``X'hex'`` (str() on bytes emits
    the b'..' repr — corrupt on every engine); tz-AWARE datetimes are
    converted to UTC and rendered naive (the reference pins the session
    to UTC, bootstrap.php:9-11 — MySQL's TIMESTAMP text protocol takes
    no offset suffix); microseconds render only when present.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, Decimal):
        # Non-finite Decimals ('NaN', 'Infinity') would render as bare
        # invalid SQL tokens — MySQL DECIMAL has no such values; refuse.
        # Exponent forms (Decimal('1E+2') → '1E+2') would parse back as
        # float, so render plain fixed-point: value-exact on every
        # engine, and parse_sql_literal recovers Decimal whenever a
        # fractional part survives (a positive-exponent integer value
        # comes back as int — same SQL value, DECIMAL columns carry the
        # scale).
        if not v.is_finite():
            raise ValueError(f"non-finite Decimal has no SQL literal: {v}")
        return format(v, "f")
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            raise ValueError(f"non-finite float has no SQL literal: {v!r}")
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return f"X'{bytes(v).hex().upper()}'"
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return f"'{v.isoformat(sep=' ')}'"
    if isinstance(v, date):
        return f"'{v.isoformat()}'"
    s = str(v)
    if backslash_escapes:
        s = s.replace("\\", "\\\\")
    s = s.replace("'", "''")
    return f"'{s}'"


#: MySQL's zero-date sentinels — representable in the text protocol but
#: NOT as Python datetimes; DBAPI drivers surface them as strings (or
#: None under CONVERT_ZERO_DATES). parse_sql_literal returns them as
#: the verbatim strings so a sync round-trip preserves them.
ZERO_DATES = ("0000-00-00", "0000-00-00 00:00:00")


def parse_sql_literal(s: str, backslash_escapes: bool = False):
    """Inverse of :func:`sql_literal` — the parse-back direction of the
    wire-fixture goldens (recorded text-protocol round trips standing
    in for a live mysqld, which the sandbox will never have). Returns
    ``None``/``bytes``/``int``/``float``/``Decimal``-as-Decimal/``str``;
    temporal strings come back VERBATIM (including zero-dates — the
    caller casts by column type, exactly like a DBAPI driver)."""
    s = s.strip()
    if s.upper() == "NULL":
        return None
    if (s.startswith("X'") or s.startswith("x'")) and s.endswith("'"):
        return bytes.fromhex(s[2:-1])
    if s.startswith("'") and s.endswith("'"):
        body = s[1:-1].replace("''", "'")
        if backslash_escapes:
            body = body.replace("\\\\", "\\")
        return body
    try:
        if "." in s or "e" in s.lower():
            # exact-scale decimals survive; float forms parse as float
            return float(s) if ("e" in s.lower()) else Decimal(s)
        return int(s)
    except (ValueError, ArithmeticError) as exc:
        raise ValueError(f"unparseable SQL literal: {s!r}") from exc


def quote_ident(name: str, quote: str = "`") -> str:
    return f"{quote}{name}{quote}"


def insert_sql(
    table: str,
    cols: Sequence[str],
    rows: Iterable[Sequence],
    quote: str = "`",
    backslash_escapes: bool = False,
) -> str:
    """Multi-row INSERT (TableConnection.php:289-360)."""
    col_list = ", ".join(quote_ident(c, quote) for c in cols)
    values = ",".join(
        "(" + ", ".join(sql_literal(v, backslash_escapes) for v in row) + ")"
        for row in rows
    )
    return f"INSERT INTO {quote_ident(table, quote)} ({col_list}) VALUES {values}"


def delete_sql(
    table: str,
    pk_cols: Sequence[str],
    pk_tuples: Iterable[Sequence],
    quote: str = "`",
    backslash_escapes: bool = False,
) -> str:
    """Composite-key tuple DELETE (TableConnection.php:367-387):
    ``DELETE FROM t WHERE (a, b) IN ((1,2),(3,4))``."""
    key = "(" + ", ".join(quote_ident(c, quote) for c in pk_cols) + ")"
    tuples = ",".join(
        "(" + ", ".join(sql_literal(v, backslash_escapes) for v in t) + ")"
        for t in pk_tuples
    )
    return f"DELETE FROM {quote_ident(table, quote)} WHERE {key} IN ({tuples})"


def _chunks(it: Iterator, size: int) -> Iterator[list]:
    while True:
        chunk = list(itertools.islice(it, size))
        if not chunk:
            return
        yield chunk


def apply_deletes(
    keys: DataFrame,
    table: str,
    pk_cols: Sequence[str],
    connection_factory: Callable[[], object],
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    quote: str = "`",
    backslash_escapes: bool = False,
) -> None:
    """Execute chunked deletes for every key row, one connection per
    partition (executors can't share the driver's connection)."""
    cols = list(pk_cols)

    def run(partition: Iterator) -> None:
        it = (tuple(row[c] for c in cols) for row in partition)
        first = next(it, None)
        if first is None:
            return
        conn = connection_factory()
        try:
            cur = conn.cursor()
            for chunk in _chunks(itertools.chain([first], it), chunk_size):
                cur.execute(delete_sql(table, cols, chunk, quote, backslash_escapes))
            conn.commit()
        finally:
            conn.close()

    keys.select(*cols).foreachPartition(run)


def apply_inserts(
    rows: DataFrame,
    table: str,
    connection_factory: Callable[[], object],
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    quote: str = "`",
    backslash_escapes: bool = False,
) -> None:
    """Execute chunked multi-row inserts, one connection per partition."""
    cols = rows.columns

    def run(partition: Iterator) -> None:
        it = (tuple(row[c] for c in cols) for row in partition)
        first = next(it, None)
        if first is None:
            return
        conn = connection_factory()
        try:
            cur = conn.cursor()
            for chunk in _chunks(itertools.chain([first], it), chunk_size):
                cur.execute(insert_sql(table, cols, chunk, quote, backslash_escapes))
            conn.commit()
        finally:
            conn.close()

    rows.foreachPartition(run)


def apply_replace(
    rows: DataFrame,
    table: str,
    pk_cols: Sequence[str],
    connection_factory: Callable[[], object],
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    quote: str = "`",
    backslash_escapes: bool = False,
) -> None:
    """Delete-then-insert upsert — deliberately not REPLACE/ON DUPLICATE
    (the reference dodges unique-key conflicts the same way,
    TableConnection.php:599-627); delete-before-insert within each chunk
    keeps the partition-move guard (Synchronizer.php:496-517)."""
    cols = rows.columns
    pks = list(pk_cols)

    def run(partition: Iterator) -> None:
        it = (tuple(row[c] for c in cols) for row in partition)
        first = next(it, None)
        if first is None:
            return
        idx = [cols.index(c) for c in pks]
        conn = connection_factory()
        try:
            cur = conn.cursor()
            for chunk in _chunks(itertools.chain([first], it), chunk_size):
                cur.execute(
                    delete_sql(
                        table, pks, [[r[i] for i in idx] for r in chunk],
                        quote, backslash_escapes,
                    )
                )
                cur.execute(insert_sql(table, cols, chunk, quote, backslash_escapes))
            conn.commit()
        finally:
            conn.close()

    rows.foreachPartition(run)
