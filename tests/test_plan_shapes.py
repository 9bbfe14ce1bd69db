"""Plan-shape regression tests: the optimizations the engine's scale
story depends on must actually fire (broadcasts, pushdown, pruning,
whole-stage codegen). A correctness-green query with the wrong plan is
a 100 TB incident waiting — these tests pin the plan, not the rows."""

from __future__ import annotations

from spatially_databricks_etl_spark.catalog import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_star_join_broadcasts_dimensions(spark):
    plan = _plan(spark, "q5_star_join")
    assert "BroadcastHashJoin" in plan
    # dimension tables must never sort-merge against the fact table
    assert "SortMergeJoin" not in plan


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "semi_join")
    assert "LeftSemi" in plan


def test_filters_push_to_parquet_scan(spark):
    plan = _plan(spark, "q3_top_revenue_orders")
    assert "PushedFilters: [" in plan
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line and "[]" not in line
    ]
    assert pushed, "no non-empty PushedFilters in scan nodes"


def test_projection_prunes_scan_schema(spark):
    # q1 touches 7 lineitem columns; the scan must not read all 11
    plan = _plan(spark, "q1_pricing_summary")
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "l_orderkey" not in line and "l_suppkey" not in line
            return
    raise AssertionError("no ReadSchema in plan")


def test_whole_stage_codegen_covers_transform(spark):
    # '*(n)' prefixes mark whole-stage-codegen spans in simple mode;
    # the whole scan→filter→project chain must sit in one span
    plan = _plan(spark, "ref_pipeline", "simple")
    assert "*(1) Project" in plan and "*(1) Filter" in plan


def test_minhash_shuffle_carries_no_shingles(spark):
    # the LSH bucket exchange must ship only (id, band, hash) — the
    # wide shingle arrays stay out of the shuffle
    plan = _plan(spark, "minhash_neardup", "formatted")
    for line in plan.splitlines():
        if "Exchange hashpartitioning(__band" in line:
            assert "__shingles" not in line and "__sh" not in line.replace("__bh", "")
            return
    # AQE may have renamed the exchange; fall back to checking the
    # banded projection exists without shingle columns
    assert "__bh" in plan


def test_weighted_sample_plans_parallel_top_n(spark):
    # orderBy(key).limit(n) must compile to TakeOrderedAndProject
    # (per-partition partial top-n merged on the driver), never a
    # global Sort — the difference between O(n) driver work and a
    # full-corpus sort at 100 TB
    plan = _plan(spark, "weighted_sample", "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_no_catalog_query_plans_a_smell(spark):
    """Every catalog query must avoid (a) CartesianProduct, (b)
    row-at-a-time Python eval (BatchEvalPython — Arrow-batched
    ArrowEvalPython is the allowed Python boundary), and (c)
    unintended BroadcastNestedLoopJoin. Intended BNLJ uses are
    allow-listed: ann_brute_topk broadcasts the query set against the
    corpus scan by design; expectations and skew_profile join a
    single-row global-totals frame; bloom_prune_join cross-joins the
    ONE-ROW bloom bitmap onto the fact scan (a constant append per
    row, not a quadratic loop); bigram_lm cross-joins its ONE-ROW
    vocabulary-size aggregate onto the scored frame."""
    from spatially_databricks_etl_spark.catalog import QUERIES

    BNLJ_OK = {
        "ann_brute_topk",
        "expectations",
        "bloom_prune_join",
        "skew_profile",
        "bigram_lm",
        # one-row broadcast totals frame (crossJoin against a scalar
        # aggregate) — the accepted scalar-join pattern
        "heavy_hitters",
    }
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in QUERIES.items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_round5_operators_keep_their_shuffle_budget(spark):
    """Shuffle-count pins for the round-5 relational operators: the
    windowed operators must share ONE hash Exchange across their
    change-detect + numbering/aggregation stages; snapshot_diff pays
    exactly one Exchange per snapshot side; heavy_hitters' second pass
    must semi-join against BROADCAST candidates (never shuffling the
    fact side by key)."""
    import re

    from spatially_databricks_etl_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"

    def counts(name):
        plan = QUERIES[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        return (
            len(re.findall(r"Exchange hashpartitioning", plan)),
            "BroadcastHashJoin" in plan,
            "SortMergeJoin" in plan,
        )

    assert counts("sessionize") == (1, False, False)
    assert counts("cdc_apply") == (1, False, False)
    ex, bhj, smj = counts("snapshot_diff")
    assert ex == 2 and smj  # one Exchange per snapshot side, full-outer SMJ
    ex, bhj, _ = counts("heavy_hitters")
    assert ex <= 1 and bhj  # map-only pass 1; pass 2 broadcasts candidates
    ex, _, _ = counts("incremental_rollup")
    assert ex <= 2  # one partial-agg Exchange per branch; merge reuses them
