from spatially_databricks_etl_spark.plans.pipeline import reference_pipeline
from spatially_databricks_etl_spark.plans.explain import (
    explain_str,
    assert_pushed_filters,
    assert_read_schema_pruned,
)

__all__ = [
    "reference_pipeline",
    "explain_str",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
]
