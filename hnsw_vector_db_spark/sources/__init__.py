from hnsw_vector_db_spark.sources.parquet import (
    TABLES,
    load_table,
    load_tables,
    snapshot_load,
    snapshot_save,
)

__all__ = ["TABLES", "load_table", "load_tables", "snapshot_load", "snapshot_save"]
