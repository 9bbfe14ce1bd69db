"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spatially_databricks_etl_spark`` (the
engine package); this module only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spatially_databricks_etl_spark.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full reference
    ETL replay (scan → derive → filter), flattened."""
    from spatially_databricks_etl_spark.catalog import q_ref_pipeline

    return q_ref_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query. MinHash
    and the planted LSH/IVF ANN forms are deterministic on the
    fixtures and fully oracled; only simhash_neardup remains rows-only
    (xxhash64 has no DuckDB analog), with exact re-verification in
    tests/."""
    return dict(ORACLES)
