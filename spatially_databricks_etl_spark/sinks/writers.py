"""Sinks: managed-table writes and CTAS (SURVEY.md §2a #25-#27).

The reference writes a Delta gold table via SQL CTAS (`Spatially ETL
test.py:236-245`) and documents the DataFrame-writer equivalent
(`:230-231`). Local CI has no delta-spark, so one writer interface
tries Delta and falls back to parquet `saveAsTable` — identical
semantics for our checks (overwrite-mode managed table, queryable by
name). At scale add `partitionBy` on the natural read key so
downstream scans partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def save_as_table(
    df: DataFrame,
    table_name: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> None:
    """`df.write.format(delta|parquet).mode(...).saveAsTable(...)` —
    the documented equivalent of the reference CTAS (`Spatially ETL
    test.py:230-231`)."""
    spark = df.sparkSession
    fmt = fmt or ("delta" if _delta_available(spark) else "parquet")
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table_name)


def ctas(
    spark: SparkSession,
    table_name: str,
    select_sql: str,
    *,
    fmt: str | None = None,
) -> DataFrame:
    """`CREATE OR REPLACE TABLE ... USING <fmt> AS <select>` — the
    reference's SQL entry point (`Spatially ETL test.py:237-245`).

    `REPLACE TABLE AS SELECT` is a DataSource **v2** capability: Delta
    supports it atomically, but v1 file providers (parquet/orc/csv) in
    the default session catalog reject it (UNSUPPORTED_FEATURE). The
    parquet branch therefore emulates or-replace as DROP-then-CREATE —
    same end state, not atomic (a concurrent reader can see the gap);
    on Delta the native atomic form is used.

    Failure semantics of the emulated branch: the select is ANALYZED
    (parsed + resolved against the catalog) BEFORE the drop, so a bad
    query never destroys the existing table. A runtime failure during
    the CREATE's execution (e.g. disk full) can still leave no table
    behind — only the Delta branch is transactional."""
    fmt = fmt or ("delta" if _delta_available(spark) else "parquet")
    if fmt == "delta":
        spark.sql(f"CREATE OR REPLACE TABLE {table_name} USING delta AS {select_sql}")
    else:
        spark.sql(select_sql).schema  # analyze first: invalid SQL must not drop
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        spark.sql(f"CREATE TABLE {table_name} USING {fmt} AS {select_sql}")
    return spark.table(table_name)


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def save_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols)
    at WRITE time, so every later equi-join/aggregation on those
    columns skips its shuffle entirely (plan shows SortMergeJoin with
    NO Exchange under either side).

    This is the 100 TB lever for fact-fact joins: pay the shuffle once
    at ingest, never again. ``sort_cols`` additionally pre-sorts
    within buckets, removing the Sort from later SMJs. Bucketing
    requires ``saveAsTable`` (bucket metadata lives in the catalog,
    not the files)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
