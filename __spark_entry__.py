"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full §3.2 sync hot path:
diff a perturbed copy of orders against master and apply the merge
delta). ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the phase-E extensions; implementations
live in the mysql_syncer_spark/queries/ package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_syncer_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.sync_merge_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query."""
    return _registry.oracle_sql()
