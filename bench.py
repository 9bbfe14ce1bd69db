#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via a count-style action (the
write path is measured by ref_pipeline, which materializes the gold
rows). Times are wall-clock per query, value = total.
"""

from __future__ import annotations

import json
import os
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


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from spatially_databricks_etl_spark.catalog import QUERIES
    from spatially_databricks_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # Warm the JVM + parquet footers once so per-query numbers measure
    # execution, not session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
