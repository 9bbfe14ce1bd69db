"""Scalar/column function library (JVM-side, codegen-friendly).

Everything here returns/consumes ``pyspark.sql.Column`` so expressions
stay inside whole-stage codegen; no Python UDFs.
"""

from spatially_databricks_etl_spark.functions.scalar import (
    cast_columns,
    clean_split_part,
    make_struct,
    recode,
    recode_when_contains,
    rename_columns,
    snake_case_columns,
    struct_cast_fields,
)
from spatially_databricks_etl_spark.functions.text import (
    lang_id,
    ngrams,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    token_count,
    tokens,
)
from spatially_databricks_etl_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    normalize,
)

__all__ = [
    "cast_columns",
    "clean_split_part",
    "make_struct",
    "recode",
    "recode_when_contains",
    "rename_columns",
    "snake_case_columns",
    "struct_cast_fields",
    "lang_id",
    "ngrams",
    "punct_ratio",
    "quality_score",
    "rolling_fingerprint",
    "stopword_ratio",
    "token_count",
    "tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize",
]
