#!/usr/bin/env python
"""Dump .explain("formatted") for bench queries to plans/<tag>/<q>_<suffix>.txt.

Usage: PYTHONPATH=/root/repo python tools/dump_plans.py <tag> <suffix> [query ...]
With no query names, dumps every HEADLINE + EXTRA query. sf dir comes from
$SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape, not timing).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from bench import EXTRA, HEADLINE
    from spatially_databricks_etl_spark.catalog import QUERIES
    from spatially_databricks_etl_spark.session import get_spark

    if not names:
        names = [*HEADLINE, *EXTRA]

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"dump-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not in catalog", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep dumping
            txt = f"ERROR building plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"# {name} — explain(formatted) over {sf_dir}\n\n{txt}\n")
        print(f"dumped {name}", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
