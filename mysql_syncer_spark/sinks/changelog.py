"""Changelog / audit sink — the S18 generalization of LOG_QUERIES.

The reference can append every write query to a ``queries.sql`` file
(TableConnection.php:730-742, settings.php.tmpl:25-30) so a sync can be
audited or replayed. The engine's version is structured: a changelog
DataFrame ``(op, table, pk json, ts)`` derived from a computed delta —
it doubles as the dry-run artifact (what WOULD change) and is written as
parquet/JSON like any other table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changelog(
    inserts: DataFrame,
    delete_keys: DataFrame,
    table: str,
    pk_cols: Sequence[str],
    run_ts: str | None = None,
) -> DataFrame:
    """Build the audit frame for one table's delta.

    ``run_ts`` pins the timestamp for deterministic replay artifacts;
    None stamps current_timestamp() at execution.
    """
    ts = F.lit(run_ts).cast("timestamp") if run_ts else F.current_timestamp()

    def frame(df: DataFrame, op: str) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            F.lit(table).alias("table_name"),
            F.to_json(F.struct(*[F.col(c) for c in pk_cols])).alias("pk"),
            ts.alias("ts"),
        )

    return frame(delete_keys, "delete").unionByName(frame(inserts, "insert"))

