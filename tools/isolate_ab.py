#!/usr/bin/env python
"""Clean-session isolation A/B for bench watch items (the SCALE.md
protocol, rounds 9-11): ONE fresh SparkSession per query, bench-style
warmup (lineitem footer count), N iterations with clearCache between,
run 1 = cold (reported but excluded from the warm median).

Usage: python tools/isolate_ab.py <query> [iters=11] [sf_dir]

Run each query in its own PROCESS invocation (the whole point is a
fresh JVM); the driver box must be idle — check `uptime` first and
discard the run if load was elevated (SCALE.md round-11 notes show a
polluted run being discarded for exactly this reason).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> int:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from spatially_databricks_etl_spark.catalog import QUERIES
    from spatially_databricks_etl_spark.session import get_spark

    spark = get_spark(app_name=f"isolate-{name}")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    fn = QUERIES[name]
    runs: list[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    warm = runs[1:]
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs": runs,
                "warm_median": round(statistics.median(warm), 3),
                "warm_min": min(warm),
                "warm_max": max(warm),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
