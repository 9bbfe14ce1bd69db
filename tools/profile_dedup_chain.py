#!/usr/bin/env python
"""Stage-decomposed timing of the minhash→CC→funnel chain at sf0.1.

Times each stage to its own materialization (noop-style count) so the
wall cost of pair generation, connected components, and the funnel's
count branches are separable. Read-only diagnostic."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:8.3f}s  {out}", file=sys.stderr, flush=True)
    return dt


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spatially_databricks_etl_spark.operators.curate import (
        connected_components,
        curate_funnel,
        quality_score,
    )
    from spatially_databricks_etl_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dedup,
    )
    from spatially_databricks_etl_spark.session import get_spark, load_table

    spark = get_spark(app_name="profile-dedup-chain")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    docs = load_table(spark, sf_dir, "documents")
    for it in range(3):
        print(f"--- iteration {it}", file=sys.stderr, flush=True)
        sc = spark.sparkContext
        sc.setJobDescription("quality gate")
        d1 = docs.filter(quality_score(F.col("text")) >= F.lit(0.6))
        t("d1 quality gate count", d1.count)
        sc.setJobDescription("exact dedup")
        d2 = exact_dedup(d1, ["text"], keep_by="doc_id")
        t("d2 exact dedup count", d2.count)
        sc.setJobDescription("minhash pairs")
        pairs = minhash_near_dedup(d2, text_col="text", id_col="doc_id", threshold=0.7)
        pairs = pairs.persist()
        t("pairs minhash count", pairs.count)
        sc.setJobDescription("connected components")
        comp = connected_components(pairs)
        t("cc count", comp.count)
        sc.setJobDescription("kept anti-join")
        non_reps = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        kept = d2.join(non_reps, on="doc_id", how="left_anti")
        t("kept count", kept.count)
        spark.catalog.clearCache()
        sc.setJobDescription("full curate_funnel")
        t("curate_funnel end-to-end", lambda: curate_funnel(docs).count())
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
