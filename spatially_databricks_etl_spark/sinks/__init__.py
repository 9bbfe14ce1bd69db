from spatially_databricks_etl_spark.sinks.writers import (
    ctas,
    save_as_table,
    write_parquet,
)

__all__ = ["ctas", "save_as_table", "write_parquet"]
