#!/usr/bin/env python
"""Stage-attribution profiler for minhash_near_dedup at sf0.1.

NOTE: the phase builders below mirror the ROUND-3 operator internals
(string-shingle persist + banded persist + bucket self-join) and were
used to attribute its ~4.8 s E2E cost: shingle persist ~1.3 s,
candidates (agg + semi + self-join + distinct) ~1.2 s, verify joins on
string arrays ~0.7 s, signature kernel only ~0.6 s. That measurement
drove the round-4 rewrite (persist 64-bit hash codes, collect_list
bucket pair-expansion, hash-code verify — E2E ~2.3 s). The E2E probe
at the top always measures the CURRENT operator; the phase probes
remain as the historical attribution harness.
"""
from __future__ import annotations

import os
import statistics
import time

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from spatially_databricks_etl_spark.functions.text import ngrams
from spatially_databricks_etl_spark.operators.dedup import (
    minhash_near_dedup,
    minhash_signatures_df,
    shingle_hashes,
)
from spatially_databricks_etl_spark.operators.relational import ensure_parallelism
from spatially_databricks_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("PROFILE_ITERS", "3"))

spark = get_spark(app_name="profile_minhash")
spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm


def timed(label, fn):
    runs = []
    for _ in range(ITERS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fn()
        runs.append(time.perf_counter() - t0)
    print(f"{label:<38} median {statistics.median(runs):6.2f}s "
          f"[{min(runs):.2f}..{max(runs):.2f}] rows={n}", flush=True)


d = spark.read.parquet(f"{SF_DIR}/documents.parquet")

# ---- end to end -----------------------------------------------------------
timed("E2E minhash_near_dedup", lambda: minhash_near_dedup(d, threshold=0.7, shingle_size=5).count())


# ---- phase builders (mirror operator internals) ---------------------------
def build_base():
    src = ensure_parallelism(
        d.select(F.col("doc_id").alias("__id"), F.col("text").alias("__text")), "__id"
    )
    sh = ngrams(F.col("__text"), 5, character=True)
    return src.select("__id", F.array_distinct(sh).alias("__shingles")).persist(
        StorageLevel.MEMORY_AND_DISK
    )


def phase_base():
    return build_base().count()


def phase_hash():
    base = build_base()
    base.count()
    t0 = time.perf_counter()
    hashed = base.select("__id", shingle_hashes(F.col("__shingles"), seed=42).alias("__h"))
    n = hashed.count()
    print(f"    (hash-only delta: {time.perf_counter()-t0:.2f}s)", flush=True)
    return n


def phase_sig():
    base = build_base()
    base.count()
    t0 = time.perf_counter()
    hashed = base.select("__id", shingle_hashes(F.col("__shingles"), seed=42).alias("__h"))
    sig = minhash_signatures_df(hashed, hash_col="__h", sig_col="__sig", num_hashes=96, seed=42)
    n = sig.count()
    print(f"    (hash+sig delta: {time.perf_counter()-t0:.2f}s)", flush=True)
    return n


def build_banded(base, num_hashes=96, bands=16, seed=42):
    rows = num_hashes // bands
    hashed = base.select("__id", shingle_hashes(F.col("__shingles"), seed=seed).alias("__h"))
    sig = minhash_signatures_df(hashed, hash_col="__h", sig_col="__sig", num_hashes=num_hashes, seed=seed)
    return sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws("_", F.slice("__sig", b * rows + 1, rows)), F.lit(b)
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__b"),
    ).select(
        "__id", F.col("__b.band").alias("__band"), F.col("__b.band_hash").alias("__bh")
    ).persist(StorageLevel.MEMORY_AND_DISK)


def phase_cand():
    base = build_base()
    base.count()
    banded = build_banded(base)
    banded.count()
    t0 = time.perf_counter()
    ok = (
        banded.groupBy("__band", "__bh").agg(F.count("*").alias("__n"))
        .filter(F.col("__n") <= 200).select("__band", "__bh")
    )
    b2 = banded.join(ok, on=["__band", "__bh"], how="left_semi")
    left = b2.select(F.col("__id").alias("id_a"), "__band", "__bh")
    right = b2.select(F.col("__id").alias("id_b"), "__band", "__bh")
    cand = (
        left.join(right, on=["__band", "__bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    n = cand.count()
    print(f"    (cand-only delta: {time.perf_counter()-t0:.2f}s)", flush=True)
    return n


def phase_verify():
    base = build_base()
    base.count()
    banded = build_banded(base)
    banded.count()
    ok = (
        banded.groupBy("__band", "__bh").agg(F.count("*").alias("__n"))
        .filter(F.col("__n") <= 200).select("__band", "__bh")
    )
    b2 = banded.join(ok, on=["__band", "__bh"], how="left_semi")
    left = b2.select(F.col("__id").alias("id_a"), "__band", "__bh")
    right = b2.select(F.col("__id").alias("id_b"), "__band", "__bh")
    cand = (
        left.join(right, on=["__band", "__bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cand.count()
    t0 = time.perf_counter()
    from spatially_databricks_etl_spark.operators.dedup import jaccard
    sh_a = base.select(F.col("__id").alias("id_a"), F.col("__shingles").alias("__sh_a"))
    sh_b = base.select(F.col("__id").alias("id_b"), F.col("__shingles").alias("__sh_b"))
    out = (
        cand.join(sh_a, "id_a").join(sh_b, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .filter(F.col("jaccard_sim") >= 0.7)
        .select("id_a", "id_b", "jaccard_sim")
    )
    n = out.count()
    print(f"    (verify-only delta: {time.perf_counter()-t0:.2f}s)", flush=True)
    return n


timed("phase 1: shingle+persist base", phase_base)
timed("phase 2: base -> xxhash64", phase_hash)
timed("phase 3: base -> hash+signature", phase_sig)
timed("phase 4: sig -> banded (persist)", lambda: (build_base().count(), build_banded(build_base()).count())[1])
timed("phase 5: banded -> candidates", phase_cand)
timed("phase 6: cand -> verify joins", phase_verify)

spark.stop()
