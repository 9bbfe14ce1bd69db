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


def test_heavy_hitters_exact_vs_groupby_under_pruning(spark):
    """Capacity far below the distinct-key count forces real
    Misra-Gries pruning inside each partition; the two-pass result
    must still be EXACTLY the keys above N/(capacity+1) with exact
    counts (the no-miss guarantee + exact verify)."""
    from spatially_databricks_etl_spark.operators.sketches import heavy_hitters

    # 2 genuinely heavy keys buried in 500 distinct noise keys, spread
    # over many partitions so per-partition summaries must prune.
    rows = (
        [(0,)] * 400
        + [(1,)] * 300
        + [(2,)] * 90            # just under the threshold, must NOT appear
        + [(1000 + i,) for i in range(500)]
    )
    df = spark.createDataFrame(rows, ["k"]).repartition(16)
    n = len(rows)
    cap = 9
    got = {r.k: r.n_rows for r in heavy_hitters(df, "k", capacity=cap).collect()}
    thr = n / (cap + 1)
    assert got == {0: 400, 1: 300}, (got, thr)
    # shares are exact fractions of the true total
    shares = {
        r.k: r.share for r in heavy_hitters(df, "k", capacity=cap).collect()
    }
    assert abs(shares[0] - 400 / n) < 1e-12


def test_heavy_hitters_rejects_unsound_threshold(spark):
    import pytest as _pytest

    from spatially_databricks_etl_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(1,), (2,)], ["k"])
    with _pytest.raises(ValueError, match="cannot guarantee recall"):
        heavy_hitters(df, "k", capacity=4, threshold_fraction=0.05)


def test_heavy_hitters_ignores_nulls_and_empty(spark):
    from spatially_databricks_etl_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(None,), (None,), (7,), (7,), (7,), (8,)], "k: bigint"
    )
    got = {r.k: r.n_rows for r in heavy_hitters(df, "k", capacity=2).collect()}
    # N=4 non-null, threshold 4/3: only k=7 (count 3) qualifies
    assert got == {7: 3}
    empty = spark.createDataFrame([], "k: bigint")
    assert heavy_hitters(empty, "k", capacity=2).count() == 0
