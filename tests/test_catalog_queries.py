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


def test_contract_boolean_queries_hold(spark):
    """sketch_profile / stratified_sample materialize sketch- and
    sampling-accuracy contracts as boolean columns; every boolean must
    be True on the fixtures (the oracle states literal TRUE, so any
    False here = driver hash-mismatch)."""
    prof = QUERIES["sketch_profile"](spark, SF_DIR).collect()
    assert prof and all(
        r["hll_ok"] and r["q50_ok"] and r["q90_ok"] and r["q99_ok"] for r in prof
    )
    strat = QUERIES["stratified_sample"](spark, SF_DIR).collect()
    assert strat and all(r["sample_ok"] for r in strat)


def test_planted_ann_closed_form(spark):
    """The planted-corpus ANN queries must return exactly the closed
    form the oracle states: rank 1 = the query itself, ranks 2-10 =
    its first 9 planted copies, all at cosine 1.0."""
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        rows = QUERIES[name](spark, SF_DIR).collect()
        assert len(rows) == 50, name
        for r in rows:
            expect = (
                r["query_id"]
                if r["rank"] == 1
                else 2000000 + r["query_id"] * 10 + (r["rank"] - 2)
            )
            assert r["neighbor_id"] == expect, (name, dict(r.asDict()))
            assert r["cosine_sim"] == 1.0, (name, dict(r.asDict()))
