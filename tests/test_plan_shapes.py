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
        # TPC-H Q11's global scalar subquery: the one-row average
        # rides a broadcast cross join onto the aggregated view
        "q11_important_stock",
        # one-row corpus-stats frames (N/avgdl; bin span + totals)
        # attached via broadcast cross join — same scalar-join pattern
        "bm25_topk",
        "drift_psi",
        "drift_psi_quantile",
        "drift_ks",
        # RRF fusion composes bm25_topk + brute-force cosine top-k,
        # inheriting both scalar-join sites
        "hybrid_topk",
        # same sites plus the broadcast query-gram join of the trigram
        # retriever (keyless broadcast join against the corpus scan —
        # the ann_brute_topk pattern)
        "hybrid3_topk",
        # recall queries compose brute_force_topk (broadcast query set
        # against the corpus scan, by design); the LSH/PQ recall
        # siblings additionally share the pattern via the approximate
        # side's broadcast probe/shortlist joins
        "ann_recall",
        "ann_lsh_recall",
        "ann_pq_recall",
        # truncation eval: BOTH sides are deliberate brute-force exact
        # baselines (broadcast query set against the corpus scan)
        "ann_matryoshka_recall",
        "retrieval_metrics",
        # one-row Σ√avail denominator frame via broadcast cross join —
        # the accepted scalar-join pattern
        "mixture_temperature",
        # one-row contingency-totals frame via broadcast cross join —
        # the accepted scalar-join pattern
        "drift_chi2",
        # same one-row totals frame as drift_ks (shared ECDF tail)
        "drift_wasserstein",
        # one-row basket-universe / grand-total frames via broadcast
        # cross join — the accepted scalar-join pattern
        "assoc_rules",
        "mutual_info",
        "collocations",
        "column_entropy",
        # one-row total-weight frame via broadcast cross join — the
        # accepted scalar-join pattern
        "weighted_quantiles",
        # one-row snapshot-counts frame via broadcast cross join (twice:
        # into the dim frame and onto the final row) — the accepted
        # scalar-join pattern
        "drift_embedding",
        # one-row total frame onto the 9-digit literal axis — same
        # scalar-join pattern
        "benford_audit",
        # the 5-row quantized query set broadcasts against the corpus
        # scan with an inequality guard (self-exclusion) — the
        # ann_brute_topk pattern
        "mmr_rerank",
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


def test_q19_disjunction_splits_into_pushed_residuals(spark):
    """The OR-of-ANDs join condition must be split by the optimizer
    (SPARK-32302) into per-side convertible residuals pushed into
    BOTH parquet scans, with the factored common conjunct in the
    lineitem scan and the join reduced to a broadcast hash join — the
    difference between scanning three brand/size bands and scanning
    everything at 100 TB."""
    plan = _plan(spark, "q19_disjunctive_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("Or(" in ln and "p_brand" in ln for ln in pushed), pushed
    assert any("Or(" in ln and "l_quantity" in ln for ln in pushed), pushed
    assert any("EqualTo(l_linestatus,F)" in ln for ln in pushed), pushed
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q15_and_q17_scan_lineitem_once(spark):
    """View-reuse / correlated-scalar decorrelation must not re-scan
    the fact table: Q15's max-revenue view aggregates lineitem ONCE
    (max() OVER () on the aggregated frame), and Q17's per-part
    average rides a window on the already-joined scan."""
    for name in ("q15_top_supplier", "q17_small_quantity_revenue"):
        plan = _plan(spark, name)
        li_scans = [
            ln
            for ln in plan.splitlines()
            if "Location:" in ln and "lineitem.parquet" in ln
        ]
        assert len(li_scans) == 1, (name, li_scans)


def test_q16_not_in_plans_as_broadcast_anti(spark):
    """The NOT-IN exclusion over the supplier dimension must plan as
    a broadcast ANTI join on the fact side with the part predicates
    (<>, NOT LIKE, IN-list) in the part scan's PushedFilters."""
    plan = _plan(spark, "q16_supplier_counts")
    assert "BuildRight" in plan and "LeftAnti" in plan
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "Not(EqualTo(p_brand,Brand#3))" in pushed
    assert "Not(StringStartsWith(p_type,SMALL))" in pushed
    assert "In(p_size," in pushed


def test_q7_nation_pair_residual_pushes_into_both_nation_scans(spark):
    """The symmetric nation-pair disjunction's convertible residual
    (n_name IN (A, B)) must reach BOTH broadcast nation scans."""
    plan = _plan(spark, "q7_nation_volume")
    nation_or = [
        ln
        for ln in plan.splitlines()
        if "PushedFilters" in ln and "n_name" in ln and "Or(" in ln
    ]
    assert len(nation_or) >= 2, nation_or
    assert "CartesianProduct" not in plan


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


def test_asof_tolerance_window_form_single_exchange(spark):
    """VERDICT r11 item 3: the PRODUCTION tolerance path
    (``asof_join_tolerance_window`` — relational.asof_join with a
    staleness bound) must keep the plain as-of's plan: the tolerance
    gate is a post-fold conditional on the SAME single key Exchange —
    one shuffle, no Arrow cogroup boundary, no Python in the hot
    path. The ~25x-costlier cogroup twin stays as the merge_asof
    semantics pin; this is the plan a user gets at 100 TB."""
    import re

    from spatially_databricks_etl_spark.catalog import QUERIES

    plan = (
        QUERIES["asof_join_tolerance_window"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan
    # nearest keeps the same budget: two window folds, still one Exchange
    plan_n = (
        QUERIES["asof_join_nearest"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan_n)) == 1
