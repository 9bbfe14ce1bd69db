#!/usr/bin/env python
"""Stage-decomposed timing of minhash_near_dedup internals at sf0.1."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:8.3f}s  {out}", file=sys.stderr, flush=True)
    return dt


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spatially_databricks_etl_spark.functions.text import ngrams
    from spatially_databricks_etl_spark.operators.dedup import (
        _band_rows,
        _expand_verify_pairs,
        minhash_signatures_df,
        shingle_hashes,
    )
    from spatially_databricks_etl_spark.operators.relational import ensure_parallelism
    from spatially_databricks_etl_spark.session import get_spark, load_table

    spark = get_spark(app_name="profile-minhash-stages")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    docs = load_table(spark, sf_dir, "documents")
    for it in range(4):
        print(f"--- iteration {it}", file=sys.stderr, flush=True)
        src = ensure_parallelism(
            docs.select(F.col("doc_id").alias("__id"), F.col("text").alias("__text")),
            "__id",
        )
        sh = ngrams(F.col("__text"), 5, character=True)
        base = src.select(
            "__id", shingle_hashes(sh, seed=42, mask32=False).alias("__h")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        t("1 base shingle+hash persist", base.count)
        # the kernel masks to 32 bits itself — no mask32_hashes
        # projection, matching the shipped minhash_near_dedup path
        sig = minhash_signatures_df(
            base.filter(F.size("__h") > 0),
            hash_col="__h",
            sig_col="__sig",
            num_hashes=96,
            seed=42,
        )
        t("2 signatures (codegen min-aggs)", lambda: sig.write.format("noop").mode("overwrite").save())
        banded = _band_rows(sig, bands=16, rows=6)
        t("3 band rows", lambda: banded.write.format("noop").mode("overwrite").save())
        out, obs, fb = _expand_verify_pairs(banded, base, threshold=0.7, max_bucket_size=200)
        t("4 pairs expand+verify", out.count)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
