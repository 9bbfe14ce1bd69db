from spatially_databricks_etl_spark.sources.files import (
    read_csv,
    read_json,
    read_jsonl_docs,
    read_parquet,
    read_parquet_evolved,
)
from spatially_databricks_etl_spark.sources.rest import (
    PagedRestDataSource,
    fetch_paginated_to_df,
    paginated_offsets_df,
    register_paged_rest,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_jsonl_docs",
    "read_parquet",
    "read_parquet_evolved",
    "fetch_paginated_to_df",
    "paginated_offsets_df",
    "PagedRestDataSource",
    "register_paged_rest",
]
