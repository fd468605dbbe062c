"""Typed configuration — the Spark mirror of settings.php.tmpl.

The reference's user-facing surface is a handful of PHP constants
(src/settings/settings.php.tmpl): IGNORE_TABLES regexes (:50-53),
PARTITIONED_TABLE_DEFINITIONS (:59-61), SYNC_SHARED_PARTITIONS (:67),
COPY_TABLES_WITH_NO_PRIMARY (:45), CHUNK_SIZE (:34),
USE_MULTI_PROCESSING (:39). Here they are a dataclass, plus the
TableHandle that carries the PK metadata Spark doesn't have natively.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class TableHandle:
    """A DataFrame + the relational metadata Spark lacks (PK, partition
    column) — SURVEY.md §1 'Table' row."""

    name: str
    df: DataFrame
    pk_cols: tuple[str, ...] = ()
    partition_col: str | None = None

    @property
    def has_pk(self) -> bool:
        return len(self.pk_cols) > 0


@dataclass(frozen=True)
class SyncConfig:
    """Engine configuration (reference: settings.php.tmpl)."""

    #: regexes; any table whose name matches is excluded from sync
    #: (Synchronizer.php:300-320)
    ignore_tables: tuple[str, ...] = ()
    #: table -> partition column (settings.php.tmpl:59-61); partition-wise
    #: sync recommended >1M rows (README.md:33,53)
    partitioned_tables: dict[str, str] = field(default_factory=dict)
    #: also diff partitions present on both sides (settings.php.tmpl:67)
    sync_shared_partitions: bool = True
    #: tables with no PK: full-copy if True, skip if False
    #: (settings.php.tmpl:45, Synchronizer.php:213-222)
    copy_tables_with_no_primary: bool = True
    #: JDBC write batch size — the reference's CHUNK_SIZE=5000
    #: (settings.php.tmpl:32-34); irrelevant for parquet mode
    chunk_size: int = 5000
    #: concurrent sync units (reference: ThreadWrapper.jar <cores>)
    max_parallel_tables: int = 8
    #: 'hash' = reference-faithful content-set diff; 'pk_hash' = strict
    join_mode: str = "pk_hash"
    #: write every planned mutation to a changelog instead of applying
    #: (generalizes LOG_QUERIES, settings.php.tmpl:25-30)
    dry_run: bool = False
    #: hard ceiling on distinct partition values collected to the driver
    #: during partitioned sync planning. Partition values are metadata
    #: (the reference enumerates them the same way, Synchronizer.php:
    #: 128-149) — but a mistyped partition column (e.g. a timestamp)
    #: would turn the collect data-sized; past this bound the executor
    #: raises instead of OOMing the driver.
    max_partition_values: int = 100_000
    #: server-side row-hash pushdown (SURVEY §4 row 2): the MASTER
    #: computes MD5 row hashes inside the source database
    #: (TableConnection.php:46-51) so only (pk, 32-byte hash) crosses
    #: the wire; full rows are point-fetched for the missing keys only.
    #: Requires a master catalog with hash_frame (DBAPI/JDBC/MySQL).
    #: Worth it when the source DB has spare CPU and the WAN is the
    #: bottleneck; the default pulls raw rows and hashes in executors.
    #:
    #: Crossover guidance (SMALL-DELTA mode): with a DBAPI master, the
    #: missing rows are point-fetched through the driver in
    #: chunk_size batches over max_parallel_tables threads
    #: (executor._stream_keyed_fetch) — memory is bounded
    #: (max_parallel_tables × chunk_size rows in flight) but
    #: throughput is driver-routed, roughly
    #: max_parallel_tables × chunk_size / round_trip rows/s. Fine for
    #: the steady-state few-percent delta; a FIRST sync or a 100×
    #: delta belongs on the distributed paths (JDBC partitioned scan
    #: or parquet), which read the table with executor parallelism —
    #: leave hash_pushdown off there, or use JDBCSyncExecutor whose
    #: pushdown fetch stays server-side.
    hash_pushdown: bool = False
    #: path of an ordered, REPLAYABLE SQL statement file (the
    #: reference's LOG_QUERIES query log, settings.php.tmpl:25-30, at
    #: full fidelity): every planned mutation is composed with the
    #: sinks' own statement renderers, deletes-before-inserts per table
    #: (Synchronizer.php:496-517), so replaying the file through a
    #: DBAPI connection reproduces the converged slave exactly.
    #: Combine with dry_run=True for a replayable preview that touches
    #: nothing. SQL-slave executors only (DBAPI/JDBC).
    log_statements: str | None = None
    #: parquet dir for the STRUCTURED changelog (sinks/changelog.py):
    #: every computed row delta appends ``(op, table_name, pk json,
    #: ts)`` — the queryable audit twin of log_statements, written
    #: distributed (no driver row loop), for EVERY executor flavor
    #: including parquet slaves. Row-grain only: table-level ops
    #: (drop/full-copy) live in the SyncReport and the statement log.
    #: Works under dry_run (the what-WOULD-change artifact).
    changelog_path: str | None = None
