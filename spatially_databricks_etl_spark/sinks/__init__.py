from spatially_databricks_etl_spark.sinks.layout import (
    compact_files,
    shard_by_size,
    write_bucketed,
    write_range_sorted,
    write_similarity_clustered,
    write_zordered,
)
from spatially_databricks_etl_spark.sinks.versioned import (
    versioned_diff,
    versioned_read,
    versioned_vacuum,
    versioned_write,
)
from spatially_databricks_etl_spark.sinks.writers import (
    ctas,
    save_as_table,
    write_parquet,
)

__all__ = [
    "compact_files",
    "ctas",
    "shard_by_size",
    "save_as_table",
    "write_bucketed",
    "write_parquet",
    "write_range_sorted",
    "write_similarity_clustered",
    "write_zordered",
    "versioned_diff",
    "versioned_read",
    "versioned_vacuum",
    "versioned_write",
]
