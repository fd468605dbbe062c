from mysql_syncer_spark.sources.catalog import (
    Catalog,
    ParquetCatalog,
    JDBCCatalog,
    DEFAULT_PKS,
)
from mysql_syncer_spark.sources.dbapi import DBAPICatalog

__all__ = [
    "Catalog", "ParquetCatalog", "JDBCCatalog", "DBAPICatalog", "DEFAULT_PKS",
]
