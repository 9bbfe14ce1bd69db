"""Sketch accuracy-contract tests: every approximate answer is checked
against the exact recomputation within the sketch's stated bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from spatially_databricks_etl_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    distinct_over_union,
    frequency_sketch,
)
from spatially_databricks_etl_spark.session import load_table
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    approx = approx_distinct(li, "l_partkey", rsd=0.02).collect()[0][0]
    assert abs(approx - exact) <= max(3 * 0.02 * exact, 2), (approx, exact)


def test_hll_union_matches_direct_estimate(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    merged = distinct_over_union(li, "l_partkey", "l_returnflag").collect()[0][0]
    # Datasketches HLL at lg_k=12: rse ~ 1.04/sqrt(2^12) ≈ 1.6%
    assert abs(merged - exact) <= max(0.05 * exact, 2), (merged, exact)


def test_count_min_point_queries_overcount_only(spark):
    ev = load_table(spark, SF_DIR, "events")
    n = ev.count()
    from spatially_databricks_etl_spark.operators.sketches import cms_estimate

    sk = ev.agg(frequency_sketch("event_type", eps=0.001).alias("sk")).collect()[0]["sk"]
    exact = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    for et, cnt in exact.items():
        est = cms_estimate(spark, sk, et)
        # count-min never undercounts; additive overcount ≤ eps·N (whp)
        assert est >= cnt
        assert est - cnt <= max(2 * 0.001 * n, 2), (et, est, cnt)


def test_approx_quantiles_rank_error(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    vals = sorted(r["l_extendedprice"] for r in li.select("l_extendedprice").collect())
    got = approx_quantiles(li, "l_extendedprice", [0.5], accuracy=10000).collect()[0][0][0]
    n = len(vals)
    # rank error ≤ n/accuracy (+1 slack)
    lo = vals[max(0, int(0.5 * n) - n // 10000 - 2)]
    hi = vals[min(n - 1, int(0.5 * n) + n // 10000 + 2)]
    assert lo <= got <= hi, (lo, got, hi)
