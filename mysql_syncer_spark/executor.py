"""Sync executor — applies a SyncPlan and reports what it did.

Parquet ("file") mode is the primary path: mutations are expressed as
pure-DataFrame rewrites (anti-join out deletes, union in inserts) and an
atomic overwrite of the slave table. JDBC-mode deletes/inserts (the
reference's chunked DELETE ... IN / multi-row INSERT,
src/project/TableConnection.php:289-387) are in sinks/jdbc.py.

Control flow per table mirrors the reference hot path
(Synchronizer.php:193-230 / SURVEY.md §3.2):

  schema compare → digest short-circuit → hash maps → anti-joins → apply

Parallelism: one thread per sync unit submitting independent Spark jobs
(FAIR scheduler pool), replacing the reference's one-OS-process-per-table
ThreadWrapper pool (Synchronizer.php:73-101). Errors are isolated per
unit — the reference's ``|| true`` (Synchronizer.php:77) becomes
try/except + a row in the report.
"""

from __future__ import annotations

import os
import shutil
import time
import traceback
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import functions as F

from mysql_syncer_spark.config import SyncConfig, TableHandle
from mysql_syncer_spark.diff import apply_delta, diff_tables
from mysql_syncer_spark.digest import digests_equal, differing_partitions
from mysql_syncer_spark.plans.plan import Action, SyncPlan, SyncUnit, plan_sync
from mysql_syncer_spark.sinks import jdbc
from mysql_syncer_spark.sources.catalog import ParquetCatalog


@dataclass
class UnitResult:
    table: str
    action: str
    status: str = "ok"            # ok | noop | error | skipped
    inserted: int = 0
    deleted: int = 0
    seconds: float = 0.0
    error: str = ""


@dataclass
class SyncReport:
    results: list[UnitResult] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(r.status != "error" for r in self.results)

    def summary(self) -> dict:
        return {
            "tables": len(self.results),
            "noop": sum(r.status == "noop" for r in self.results),
            "errors": sum(r.status == "error" for r in self.results),
            "inserted": sum(r.inserted for r in self.results),
            "deleted": sum(r.deleted for r in self.results),
        }


class ParquetSyncExecutor:
    """Executes a SyncPlan between two ParquetCatalogs (slave mutated)."""

    def __init__(self, master: ParquetCatalog, slave: ParquetCatalog,
                 config: SyncConfig | None = None):
        self.master = master
        self.slave = slave
        self.cfg = config or SyncConfig()
        self.spark = master.spark
        self._stmt_log = None
        if self.cfg.log_statements is not None:
            self._stmt_log = self._make_statement_log()

    def _make_statement_log(self):
        """Replayable queries.sql emitter (S18; the reference's
        LOG_QUERIES). Needs a SQL-shaped slave — the statement quoting
        and the full-copy DDL come from the slave catalog."""
        if not hasattr(self.slave, "create_table_sql"):
            raise ValueError(
                "log_statements requires a SQL-backed slave catalog "
                "(DBAPI/Derby executors); file-backed slaves have no "
                "statement form"
            )
        from mysql_syncer_spark.sinks.statement_log import StatementLog

        return StatementLog(
            self.cfg.log_statements,
            quote=getattr(self.slave, "quote", '"'),
            backslash_escapes=getattr(self.slave, "backslash_escapes", False),
            chunk_size=self.cfg.chunk_size,
        )

    def _log_delta(self, table, pk_cols, inserts, deletes) -> None:
        if self._stmt_log is not None:
            self._stmt_log.log_delta(table, pk_cols, inserts, deletes)
        if self.cfg.changelog_path is not None:
            from mysql_syncer_spark.sinks.changelog import changelog

            changelog(
                inserts, deletes.select(*pk_cols), table, pk_cols
            ).write.mode("append").parquet(self.cfg.changelog_path)

    # -- unit handlers ------------------------------------------------

    def _drop(self, unit: SyncUnit, res: UnitResult) -> None:
        if self.cfg.dry_run:
            res.status = "dry_run"
            return
        path = self.slave.table_path(unit.table)
        if os.path.exists(path):
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
        self.slave.invalidate()

    def _full_copy(self, unit: SyncUnit, res: UnitResult) -> None:
        """The reference's copyTable (drop + create + chunked scan/insert,
        Synchronizer.php:330-354, self-described 'extremely slow!') is a
        single parallel read→write here."""
        if self.cfg.dry_run:
            res.status = "dry_run"
            return
        mdf = self.master.table(unit.table).df
        self.slave.write_table(mdf, unit.table)
        self.slave.invalidate()

    def _copy_if_changed(self, unit: SyncUnit, res: UnitResult) -> None:
        """No-PK shared table: digest both sides first; copy only on
        mismatch. The reference always copies no-PK tables
        (Synchronizer.php:213-222) — at scale an unchanged 100 TB table
        must cost two scans, not a rewrite."""
        m = self.master.table(unit.table)
        s = self.slave.table(unit.table)
        if digests_equal(m.df, s.df):
            res.status = "noop"
            return
        if self.cfg.dry_run and self._stmt_log is None:
            res.status = "dry_run"
            return
        # with a statement log, fall through: _full_copy logs the
        # replayable statements and handles dry_run itself
        self._full_copy(unit, res)

    def _diff_sync(self, unit: SyncUnit, res: UnitResult) -> None:
        if self.cfg.hash_pushdown:
            if not hasattr(self.master, "hash_frame"):
                raise ValueError(
                    "hash_pushdown=True requires a master catalog that "
                    "computes hashes server-side (DBAPICatalog, "
                    "MySQLCatalog, JDBCCatalog); "
                    f"{type(self.master).__name__} cannot"
                )
            self._diff_sync_pushdown(unit, res)
            return
        m = self.master.table(unit.table)
        s = self.slave.table(unit.table)
        # digest short-circuit (Synchronizer.php:204-225): one cheap
        # commutative-digest job per side; equal ⇒ zero row work.
        if digests_equal(m.df, s.df):
            res.status = "noop"
            return
        if unit.action == Action.DIFF_SYNC_PARTITIONED and unit.partition_col:
            self._diff_sync_partitioned(unit, m, s, res)
            return
        self._apply_diff(unit.table, m.df, s.df, m.pk_cols, res)

    def _diff_sync_pushdown(self, unit: SyncUnit, res: UnitResult) -> None:
        """Minimal-egress diff (SURVEY §4 row 2): the master computes the
        MD5 row hash INSIDE the source database (the reference's
        hash-map staging, TableConnection.php:46-51), so only
        (pk, 32-byte hash) crosses the wire; the slave side hashes
        locally with the byte-compatible MySQL text-protocol renderer.
        Full rows travel only for the missing keys, via chunked keyed
        point fetches (TableConnection.php:177-209) when the master
        supports them. No separate digest short-circuit: an unchanged
        table yields empty anti-joins from the hash maps alone, which is
        already the minimal wire cost in this mode. Partitioned tables
        (DIFF_SYNC_PARTITIONED) also take this path whole-table: the
        hash map IS the per-partition staging content (S16/S17), and
        partition pruning would only trim an already-minimal
        (pk, hash) transfer."""
        from mysql_syncer_spark.canon import HASH_COL
        from mysql_syncer_spark.diff import excess_rows, missing_rows, rows_to_copy
        from mysql_syncer_spark.digest import mysql_compat_row_hash_col

        table = unit.table
        if hasattr(self.master, "table_meta"):
            # DBAPI: learn shape without fetching rows
            cols, pk, _ = self.master.table_meta(table)
            mh = self.master.hash_frame(table)
        else:
            # JDBC: the handle's df is lazy (no fetch until an action)
            h = self.master.table(table)
            cols, pk = list(h.df.columns), tuple(h.pk_cols)
            mh = self.master.hash_frame(table, cols, pk)
        pk = list(pk)
        if not pk:
            raise ValueError(
                f"table {table!r} has no primary key — hash pushdown "
                "needs per-PK hash maps (no-PK tables take the digest "
                "copy-if-changed path; disable hash_pushdown for them)"
            )
        s = self.slave.table(table)
        sh = s.df.select(
            *pk, mysql_compat_row_hash_col(s.df, cols).alias(HASH_COL)
        )
        miss = missing_rows(mh, sh, pk, mode="pk_hash").persist()
        exc = excess_rows(mh, sh, pk, mode="pk_hash").persist()
        spill = None
        try:
            # delta sizes via distributed counts — the driver never
            # holds the key list whole (a first sync or bulk reload has
            # a delta the size of the table)
            res.inserted = miss.count()
            res.deleted = exc.count()
            if res.inserted == 0 and res.deleted == 0:
                res.status = "noop"
                return
            if self.cfg.dry_run and self._stmt_log is None:
                res.status = "dry_run"
                return
            # a statement log needs the full insert rows even under
            # dry_run (the file must be replayable), so the keyed fetch
            # runs before the dry_run return in that mode
            if hasattr(self.master, "fetch_rows"):
                inserts, spill = self._stream_keyed_fetch(table, miss, pk)
            else:
                inserts = rows_to_copy(self.master.table(table).df, miss, pk)
            self._log_delta(table, pk, inserts, exc)
            if self.cfg.dry_run:
                res.status = "dry_run"
                return
            self._apply_changes(table, pk, inserts, exc, s.df)
            self.slave.invalidate()
        finally:
            miss.unpersist()
            exc.unpersist()
            if spill is not None:
                import shutil

                shutil.rmtree(spill, ignore_errors=True)

    def _stream_keyed_fetch(self, table: str, miss, pk: list):
        """Bounded-memory keyed fetch: stream the missing-key frame
        through the driver chunk-wise (``toLocalIterator`` holds at
        most one partition), issue the master's chunked
        ``WHERE (pk...) IN`` point fetch per ``chunk_size`` keys, and
        spill each chunk's rows to a local parquet staging dir — the
        reference's CHUNK_SIZE discipline
        (TableConnection.php:177-209, settings.php.tmpl:32-34) at ANY
        delta size; a first sync pointed at the pushdown path stays
        flat in driver memory.

        r10: chunks are fetched by a pool of
        ``cfg.max_parallel_tables`` threads — the reference's own
        process-pool economics (ThreadWrapper.jar / main.php) applied
        within one table. Each worker opens its own DBAPI connection
        (``fetch_rows`` is connection-per-call) and writes its rows to
        a PRIVATE spill subdir (concurrent parquet appends to one path
        race on the shared ``_temporary`` committer dir). In-flight
        work is capped at the pool width, so driver memory is bounded
        by ``max_parallel_tables × chunk_size`` keys+rows instead of
        one chunk — still table-size-independent. Throughput remains
        DRIVER-ROUTED: this path is the small-delta mode (see
        ``SyncConfig.hash_pushdown``); a 100×-scale first sync belongs
        on the distributed JDBC/parquet read paths. Returns
        ``(inserts_df, spill_dir)``; the caller removes ``spill_dir``
        after the delta is applied."""
        import tempfile
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor
        from concurrent.futures import wait as fwait

        spill = tempfile.mkdtemp(prefix=f"syncer_fetch_{table}_")
        chunk_size = self.cfg.chunk_size
        workers = max(1, int(self.cfg.max_parallel_tables))

        def fetch_one(idx: int, keys: list) -> str:
            rows = self.master.fetch_rows(
                table, keys, pk, chunk_size=chunk_size
            )
            out = f"{spill}/c{idx:06d}"
            rows.write.mode("overwrite").parquet(out)
            return out

        dirs: list = []
        pending: set = set()
        chunk: list = []
        idx = 0
        try:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                def reap(done) -> None:
                    # result() re-raises a worker's exception EAGERLY,
                    # aborting the producer loop instead of streaming
                    # the rest of toLocalIterator into a doomed sync
                    for f in done:
                        dirs.append(f.result())

                def submit() -> None:
                    nonlocal idx, pending
                    if not chunk:
                        return
                    # bound in-flight chunks to the pool width: the
                    # producer blocks instead of buffering the key stream
                    while len(pending) >= workers:
                        done, pending = fwait(
                            pending, return_when=FIRST_COMPLETED
                        )
                        reap(done)
                    pending.add(pool.submit(fetch_one, idx, list(chunk)))
                    idx += 1
                    chunk.clear()

                try:
                    for r in miss.toLocalIterator():
                        chunk.append(tuple(r))
                        if len(chunk) >= chunk_size:
                            submit()
                    submit()
                    done, _ = fwait(pending)
                    reap(done)
                except BaseException:
                    for f in pending:
                        f.cancel()
                    raise
        except BaseException:
            # the caller only learns the spill path from our return
            # value — on an error it never does, so clean up here
            import shutil

            shutil.rmtree(spill, ignore_errors=True)
            raise
        if not dirs:
            _, _, schema = self.master.table_meta(table)
            return self.spark.createDataFrame([], schema), spill
        return self.spark.read.parquet(*sorted(dirs)), spill

    def _diff_sync_partitioned(self, unit: SyncUnit, m: TableHandle,
                               s: TableHandle, res: UnitResult) -> None:
        """Partition-wise: find differing/missing/excess partition values
        with one digest job per side, then row-diff ONLY those partitions.
        At 100 TB this is the path that keeps a 0.1% delta sync from
        scanning rows of untouched partitions twice more."""
        pcol = unit.partition_col
        # the collect is metadata-sized for a sane partition column, but
        # bound it anyway: a mistyped column (unique per row) would
        # otherwise pull the whole key domain into the driver.
        cap = self.cfg.max_partition_values
        parts = differing_partitions(m.df, s.df, pcol).limit(cap + 1).collect()
        if len(parts) > cap:
            raise ValueError(
                f"table {unit.table!r}: partition column {pcol!r} has more "
                f"than max_partition_values={cap} differing values — this "
                "is almost certainly not a partition column; raise "
                "SyncConfig.max_partition_values only if it truly is"
            )
        if not self.cfg.sync_shared_partitions:
            # SYNC_SHARED_PARTITIONS=false (settings.php.tmpl:67,
            # Synchronizer.php:151-163): only partitions present on one
            # side are synced; partitions that exist on both sides are
            # left alone even if their contents differ.
            parts = [r for r in parts if r["status"] != "differs"]
        if not parts:
            res.status = "noop"
            return
        values = [r["partition_value"] for r in parts]
        # one combined diff over just the affected partition values —
        # partition pruning cuts the rescan; semantics identical to the
        # reference's per-value loop (Synchronizer.php:151-175) incl. the
        # delete-before-insert partition-move guard (apply_delta).
        mdf = m.df.where(F.col(pcol).isin(values))
        sdf = s.df.where(F.col(pcol).isin(values))
        self._apply_diff(unit.table, mdf, sdf, m.pk_cols, res,
                         full_slave=s.df, scope=(pcol, values))

    def _apply_diff(self, table: str, mdf, sdf, pk_cols, res: UnitResult,
                    full_slave=None, scope=None) -> None:
        d = diff_tables(mdf, sdf, pk_cols, mode=self.cfg.join_mode)
        inserts = d["insert"].persist()
        deletes = d["delete"].persist()
        try:
            res.inserted = inserts.count()
            res.deleted = deletes.count()
            if res.inserted == 0 and res.deleted == 0:
                res.status = "noop"
                return
            self._log_delta(table, pk_cols, inserts, deletes)
            if self.cfg.dry_run:
                res.status = "dry_run"
                return
            target = full_slave if full_slave is not None else sdf
            self._apply_changes(table, pk_cols, inserts, deletes, target)
            self.slave.invalidate()
        finally:
            inserts.unpersist()
            deletes.unpersist()

    def _apply_changes(self, table, pk_cols, inserts, deletes, target) -> None:
        """Materialize the delta on the slave. Parquet mode: pure-DataFrame
        merge + atomic file overwrite. Overridden by the SQL-target
        executor with distributed DELETE/INSERT statement batches."""
        merged = apply_delta(target, inserts, deletes, pk_cols)
        self.slave.write_table(merged, table)

    # -- driver --------------------------------------------------------

    def run_unit(self, unit: SyncUnit) -> UnitResult:
        res = UnitResult(table=unit.table, action=unit.action.value)
        t0 = time.time()
        try:
            # FAIR pool per sync unit: concurrent table syncs share the
            # cluster instead of FIFO head-of-line blocking — the Spark
            # replacement for one-OS-process-per-table
            # (Synchronizer.php:86-92). No-op unless
            # spark.scheduler.mode=FAIR is set on the session.
            self.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"sync-{unit.table}"
            )
            if unit.action == Action.DROP:
                self._drop(unit, res)
            elif unit.action == Action.FULL_COPY:
                self._full_copy(unit, res)
            elif unit.action == Action.COPY_IF_CHANGED:
                self._copy_if_changed(unit, res)
            elif unit.action in (Action.DIFF_SYNC, Action.DIFF_SYNC_PARTITIONED):
                self._diff_sync(unit, res)
            elif unit.action == Action.SKIP:
                res.status = "skipped"
        except Exception as e:  # crash isolation (Synchronizer.php:77)
            res.status = "error"
            res.error = f"{e}\n{traceback.format_exc(limit=5)}"
        finally:
            self.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", None
            )
        res.seconds = time.time() - t0
        return res

    def run_single(
        self, table: str, partition_value=None
    ) -> SyncReport:
        """Single-table sync — the reference's ``SyncTable.php`` entry
        point; with ``partition_value`` set, the ``SyncTablePartition.php``
        one (diff restricted to rows where the table's partition column
        equals the value; the digest short-circuit still applies via the
        restricted frames)."""
        plan = plan_sync(self.master, self.slave, self.cfg)
        units = [u for u in plan if u.table == table]
        if not units:
            raise ValueError(
                f"table {table!r} is not part of the sync plan "
                "(absent on both sides, or ignore-listed)"
            )
        unit = units[0]
        report = SyncReport()
        if partition_value is None:
            report.results.append(self.run_unit(unit))
            return report
        pcol = unit.partition_col or self.cfg.partitioned_tables.get(table)
        if not pcol:
            raise ValueError(
                f"table {table!r} has no configured partition column"
            )
        res = UnitResult(table=table, action="sync_partition")
        t0 = time.time()
        try:
            m = self.master.table(table)
            s = self.slave.table(table)
            # cast the (stringly-typed CLI) value to the column's type so
            # comparisons and partition pruning see a typed literal
            dtype = dict(m.df.dtypes)[pcol]
            lit = F.lit(partition_value).cast(dtype)
            mdf = m.df.where(F.col(pcol) == lit)
            sdf = s.df.where(F.col(pcol) == lit)
            if digests_equal(mdf, sdf):
                res.status = "noop"
            else:
                self._apply_diff(
                    table, mdf, sdf, m.pk_cols, res, full_slave=s.df
                )
        except Exception as e:
            res.status = "error"
            res.error = f"{e}\n{traceback.format_exc(limit=5)}"
        res.seconds = time.time() - t0
        report.results.append(res)
        return report

    def run(self, plan: SyncPlan | None = None) -> SyncReport:
        # fresh view of BOTH databases per run (reference semantics —
        # every run re-scans, Synchronizer.php:52-60; also heals stale
        # Spark file listings after an external writer touched either
        # side between runs).
        self.master.invalidate()
        self.slave.invalidate()
        if plan is None:
            plan = plan_sync(self.master, self.slave, self.cfg)
        report = SyncReport()
        # DDL-ish actions first, serially (cheap, mutate the catalog)
        ddl = [u for u in plan if u.action in (Action.DROP, Action.FULL_COPY)]
        diff = [u for u in plan if u.action not in (Action.DROP, Action.FULL_COPY)]
        for u in ddl:
            report.results.append(self.run_unit(u))
        if diff:
            workers = max(1, min(self.cfg.max_parallel_tables, len(diff)))
            if workers == 1:
                for u in diff:   # serial fallback (Synchronizer.php:93-101)
                    report.results.append(self.run_unit(u))
            else:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    report.results.extend(pool.map(self.run_unit, diff))
        return report


class DBAPISyncExecutor(ParquetSyncExecutor):
    """Executes a SyncPlan against a LIVE SQL slave (DBAPICatalog).

    Same control flow as the parquet executor (schema compare → digest
    short-circuit → hash diff), but mutations are the reference's real
    write path: distributed chunked ``DELETE ... WHERE (pk) IN`` /
    multi-row ``INSERT`` statements (TableConnection.php:289-387) pushed
    through executor-side connections (sinks/jdbc.py), plus DDL through
    a driver-side connection. The master may be any Catalog (parquet,
    JDBC, DBAPI) — only the slave needs a connection factory.
    """

    def __init__(self, master, slave, config: SyncConfig | None = None):
        super().__init__(master, slave, config)
        # dialect knobs the sinks need, carried by the DBAPI catalog
        self._quote = getattr(slave, "quote", '"')
        self._esc = getattr(slave, "backslash_escapes", False)

    def _execute_ddl(self, *statements: str) -> None:
        conn = self.slave.connect_factory()
        try:
            cur = conn.cursor()
            for stmt in statements:
                cur.execute(stmt)
            conn.commit()
        finally:
            conn.close()

    def _drop(self, unit: SyncUnit, res: UnitResult) -> None:
        if self._stmt_log is not None:
            self._stmt_log.log_drop(unit.table)
        if self.cfg.dry_run:
            res.status = "dry_run"
            return
        q = self._quote
        self._execute_ddl(f"DROP TABLE IF EXISTS {q}{unit.table}{q}")
        self.slave.invalidate()

    def _full_copy(self, unit: SyncUnit, res: UnitResult) -> None:
        """Drop + CREATE TABLE from the master's Spark schema + one
        distributed insert pass — the reference's copyTable
        (Synchronizer.php:330-354) without the chunked LIMIT/OFFSET walk."""
        m = self.master.table(unit.table)
        create = self.slave.create_table_sql(
            unit.table, m.df.schema, m.pk_cols
        )
        if self._stmt_log is not None:
            self._stmt_log.log_full_copy(unit.table, create, m.df)
        if self.cfg.dry_run:
            res.status = "dry_run"
            return
        q = self._quote
        self._execute_ddl(
            f"DROP TABLE IF EXISTS {q}{unit.table}{q}",
            create,
        )
        jdbc.apply_inserts(
            m.df, unit.table, self.slave.connect_factory,
            chunk_size=self.cfg.chunk_size, quote=q, backslash_escapes=self._esc,
        )
        self.slave.invalidate()

    def _apply_changes(self, table, pk_cols, inserts, deletes, target) -> None:
        # delete-before-insert (Synchronizer.php:496-517): excess keys
        # first, then replace (which deletes the changed rows' old
        # versions chunk-locally before inserting the new ones).
        jdbc.apply_deletes(
            deletes, table, pk_cols, self.slave.connect_factory,
            chunk_size=self.cfg.chunk_size, quote=self._quote,
            backslash_escapes=self._esc,
        )
        jdbc.apply_replace(
            inserts, table, pk_cols, self.slave.connect_factory,
            chunk_size=self.cfg.chunk_size, quote=self._quote,
            backslash_escapes=self._esc,
        )


class JDBCSyncExecutor(ParquetSyncExecutor):
    """Executes a SyncPlan against a LIVE JDBC slave (a
    :class:`~mysql_syncer_spark.sources.catalog.JDBCCatalog` flavor
    with driver-side statement support, e.g. ``DerbyCatalog``).

    Same control flow as the other executors (schema compare → digest
    short-circuit → hash diff), with the writes shaped for a real
    database at scale:

    * bulk row movement (full copies, insert deltas) goes through
      Spark's DISTRIBUTED JDBC writer — executors hold the
      connections; no Python worker, no driver row loop;
    * deletes are ONE server-side statement per table: the delta's
      keys are staged into a ``__sync_keys_<table>`` scratch table via
      the same distributed writer, then ``DELETE ... WHERE EXISTS
      (SELECT 1 FROM <stage> ...)`` runs INSIDE the database (the
      composite-key-safe correlated form). No key list ever passes
      through the driver, so a 100%-delta first sync stays flat in
      driver memory — the JDBC twin of the DBAPI executor's chunked
      statement sinks (sinks/jdbc.py), trading its per-chunk
      round-trips for one in-database semi-join;
    * DDL (drop/create/scratch management) runs on a driver-side
      ``java.sql`` connection.

    Delete-before-insert ordering (Synchronizer.php:496-517) is kept:
    the staged key set is the union of excess keys and changed-row
    keys, deleted in one statement before the insert pass appends.
    """

    def __init__(self, master, slave, config: SyncConfig | None = None):
        super().__init__(master, slave, config)
        for need in ("execute", "create_table_sql", "write_jdbc"):
            if not hasattr(slave, need):
                raise ValueError(
                    "JDBCSyncExecutor needs a slave catalog with "
                    f"driver-side statement support ({need!r} missing); "
                    "plain JDBCCatalog is read-only — use DerbyCatalog "
                    "or a subclass that implements the statement surface"
                )

    #: SQLStates meaning "object does not exist", swallowed on DROP
    _MISSING = ("42Y55", "42X05")

    def _drop_if_exists(self, name: str) -> None:
        self.slave.execute(
            f"DROP TABLE {self.slave._qualified(name)}",
            ignore_states=self._MISSING,
        )

    def _drop(self, unit: SyncUnit, res: UnitResult) -> None:
        if self._stmt_log is not None:
            self._stmt_log.log_drop(unit.table)
        if self.cfg.dry_run:
            res.status = "dry_run"
            return
        self._drop_if_exists(unit.table)
        self.slave.invalidate()

    def _full_copy(self, unit: SyncUnit, res: UnitResult) -> None:
        m = self.master.table(unit.table)
        create = self.slave.create_table_sql(
            unit.table, m.df.schema, m.pk_cols
        )
        if self._stmt_log is not None:
            self._stmt_log.log_full_copy(unit.table, create, m.df)
        if self.cfg.dry_run:
            res.status = "dry_run"
            return
        self._drop_if_exists(unit.table)
        self.slave.execute(create)
        self.slave.write_jdbc(m.df, unit.table)
        self.slave.invalidate()

    def _apply_changes(self, table, pk_cols, inserts, deletes, target) -> None:
        stage = f"__sync_keys_{table}"
        keys = deletes.select(*pk_cols).unionByName(
            inserts.select(*pk_cols)
        ).distinct()
        self._drop_if_exists(stage)
        # scratch DDL through our own type map (Spark's JDBC overwrite
        # would map StringType to CLOB, which Derby can't equi-compare)
        self.slave.execute(
            self.slave.create_table_sql(stage, keys.schema, ())
        )
        self.slave.write_jdbc(keys, stage)
        q = self.slave._qualified
        cond = " AND ".join(
            f'd."{c}" = t."{c}"' for c in pk_cols
        )
        try:
            self.slave.execute(
                f"DELETE FROM {q(table)} t WHERE EXISTS "
                f"(SELECT 1 FROM {q(stage)} d WHERE {cond})"
            )
            self.slave.write_jdbc(inserts, table)
        finally:
            self._drop_if_exists(stage)


def make_executor(master, slave, config: SyncConfig | None = None):
    """Pick the executor for the slave's catalog type: parquet rewrite
    for file-backed slaves, statement sinks for connection-backed ones,
    staged server-side statements for JDBC-backed ones."""
    if hasattr(slave, "connect_factory"):
        return DBAPISyncExecutor(master, slave, config)
    if hasattr(slave, "write_jdbc"):
        return JDBCSyncExecutor(master, slave, config)
    return ParquetSyncExecutor(master, slave, config)


def sync(master, slave, config: SyncConfig | None = None) -> SyncReport:
    """One-call full sync: plan + execute. After this, slave ≡ master."""
    return make_executor(master, slave, config).run()
