from mysql_syncer_spark.sources.catalog import (
    Catalog,
    ParquetCatalog,
    JDBCCatalog,
    DEFAULT_PKS,
)

__all__ = ["Catalog", "ParquetCatalog", "JDBCCatalog", "DEFAULT_PKS"]
